"""Unified query registry: name → Query(fn, oracle_sql).

Modules: core (relational surface), flow (sessionization + 77-feature
parity), textops (dedup/text analysis), similarity (embedding search).
"""

from __future__ import annotations

from anti_ddos_spark.queries.base import Query


def registry() -> dict[str, Query]:
    from anti_ddos_spark.queries import core, flow

    out: dict[str, Query] = {}
    for mod in (core, flow):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    for name, extra in _optional_modules():
        overlap = out.keys() & extra.keys()
        if overlap:
            raise ValueError(f"duplicate query names in {name}: {overlap}")
        out.update(extra)
    return out


def _optional_modules():
    """Modules that may not exist yet in early rounds."""
    for name in ("textops", "similarity", "mlops", "streamops", "joins", "media"):
        try:
            mod = __import__(f"anti_ddos_spark.queries.{name}", fromlist=["QUERIES"])
        except ImportError:
            continue
        yield name, mod.QUERIES
