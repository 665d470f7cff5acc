"""Guard for the vendored protobuf runtime's version spoof.

The vendored pure-Python runtime (anti_ddos_spark/_vendor, upstream
6.32.0-dev) declares itself 6.33.0 so PySpark's generated
StateMessage_pb2 passes ValidateProtobufRuntimeVersion (see
_vendor/README.md). That spoof silently disables the
gencode-newer-than-runtime guard — safe only while the installed
PySpark's gencode requires <= 6.33.0. This test re-reads the gencode's
declared requirement from source and fails loudly the day a PySpark
upgrade moves past it, forcing the spoof to be re-evaluated instead of
deferring a runtime-feature mismatch to a worker crash (ADVICE r4).
"""

from __future__ import annotations

import os
import re

PINNED_MAX = (6, 33, 0)  # must match _vendor runtime_version spoof


def _gencode_required_version() -> tuple[int, int, int]:
    import pyspark

    path = os.path.join(
        os.path.dirname(pyspark.__file__),
        "sql",
        "streaming",
        "proto",
        "StateMessage_pb2.py",
    )
    src = open(path).read()
    m = re.search(
        r"ValidateProtobufRuntimeVersion\(\s*[^,]+,\s*(\d+),\s*(\d+),\s*(\d+)",
        src,
    )
    assert m, f"no ValidateProtobufRuntimeVersion call found in {path}"
    return tuple(int(g) for g in m.groups())


def test_pyspark_gencode_not_newer_than_vendored_spoof():
    required = _gencode_required_version()
    assert required <= PINNED_MAX, (
        f"PySpark's StateMessage_pb2 gencode now requires protobuf "
        f"{'.'.join(map(str, required))} > spoofed "
        f"{'.'.join(map(str, PINNED_MAX))}: the vendored runtime "
        f"(anti_ddos_spark/_vendor) may lack features this gencode relies "
        f"on. Re-vendor a matching runtime and update the spoof + this pin."
    )


def test_vendored_runtime_spoof_matches_pin():
    """If the vendored runtime's declared version moves, the pin above must
    move with it (they are one decision, recorded in two places)."""
    vendor_rv = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "anti_ddos_spark",
        "_vendor",
        "google",
        "protobuf",
        "runtime_version.py",
    )
    if not os.path.isfile(vendor_rv):
        import pytest

        pytest.skip("vendored protobuf tree absent")
    src = open(vendor_rv).read()
    m = {
        k: int(re.search(rf"^OSS_{k} = (\d+)", src, re.M).group(1))
        for k in ("MAJOR", "MINOR", "PATCH")
    }
    assert (m["MAJOR"], m["MINOR"], m["PATCH"]) == PINNED_MAX
