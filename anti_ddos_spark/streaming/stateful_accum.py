"""Accumulator-state streaming sessionizer — the O(1)-memory fast path.

The insight making update-mode streaming scale: EVERY flow feature in
the 77-feature surface (SURVEY §2.4) is an algebraic function of
constant-size accumulators — (n, sum, sumsq, min, max) per series plus
last-seen timestamps/lengths per direction. Mean = sum/n, population
std = sqrt(sumsq/n - (sum/n)²), IAT stats accumulate from per-packet
diffs against the stored last timestamp. No packet arrays, no
per-packet state growth — unlike both the reference (1000-entry capped
arrays, spark_app/main.py:288-292) and our array-state variant
(stateful.py), a flow's state here is ~40 doubles regardless of
length, and partial emission costs one row construction, not an
array re-aggregation.

Tradeoffs vs the array variant (both ship; pick per workload):
- sumsq-based std loses precision for huge values (catastrophic
  cancellation) — the int()-cast features can differ ±1 from the exact
  two-pass computation (same fuzz band the test suite applies between
  the window and array paths);
- cross-batch packet reordering cannot be repaired: within a batch we
  sort by timestamp, across batches the accumulators assume arrival
  order (the reference has the same property, main.py:524).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from anti_ddos_spark.normalize import FLOW_KEY_COLS, normalize_flow_key
from anti_ddos_spark.schemas import FLOW_SCHEMA
from anti_ddos_spark.streaming.stateful import DEFAULT_TIMEOUT_MS, PKT_FIELDS

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# accumulator vector layout (all doubles for a flat Arrow round-trip)
_SERIES = [
    # (prefix, per-direction?)  n/sum/sumsq/min/max accumulate per series
    ("len", True),    # packet lengths, fwd/bwd
    ("iat", True),    # per-direction inter-arrival µs
    ("fiat", False),  # whole-flow inter-arrival µs
    ("alen", False),  # all-packet lengths
]

_SCALARS = [
    "first_ts", "last_ts", "last_fwd_ts", "last_bwd_ts",
    "prev_fwd_len", "prev_bwd_len",
    "fwd_psh", "bwd_psh", "fwd_urg", "bwd_urg",
    "fwd_hdr", "bwd_hdr",
    "fin", "syn", "rst", "psh", "ack", "urg", "cwe", "ece",
    "fwd_bulk_b", "fwd_bulk_p", "fwd_bulk_e",
    "bwd_bulk_b", "bwd_bulk_p", "bwd_bulk_e",
    "act_fwd",
    "src_is_flow_src",  # first-packet orientation: 1 if first pkt's src == flow_src
]


def _acc_names() -> list[str]:
    names: list[str] = []
    for prefix, per_dir in _SERIES:
        dirs = ("f", "b") if per_dir else ("",)
        for d in dirs:
            for stat in ("n", "s", "q", "mn", "mx"):
                names.append(f"{prefix}{d}_{stat}")
    names.extend(_SCALARS)
    return names


ACC_NAMES = _acc_names()
STATE_SCHEMA = T.StructType(
    [T.StructField("sp", T.StringType(), True), T.StructField("ss", T.StringType(), True)]
    + [T.StructField(n, T.DoubleType(), True) for n in ACC_NAMES]
)

_OUT_FIELDS = [f.name for f in FLOW_SCHEMA.fields] + ["is_final"]
OUTPUT_SCHEMA = T.StructType(
    list(FLOW_SCHEMA.fields) + [T.StructField("is_final", T.BooleanType(), False)]
)


def pack_state(acc: dict) -> tuple:
    """acc dict → the positional state tuple matching STATE_SCHEMA.

    The single source of the state layout — the GroupState path here and
    the transformWithState path (stateful_tws.py) share it; a drifted
    copy would deserialize values shifted into the wrong accumulators.
    'ss' is a reserved placeholder field kept for schema stability.
    """
    return (acc["sp"], "", *[float(acc[n]) for n in ACC_NAMES])


def unpack_state(vals: tuple) -> dict:
    """Positional state tuple → acc dict (inverse of pack_state)."""
    acc = dict(zip(["sp", "ss", *ACC_NAMES], vals))
    acc.pop("ss", None)
    return acc


def _update_accumulators(acc: dict, pdf: "pd.DataFrame", key: tuple) -> dict:
    """Vectorized-ish accumulator update for one flow's batch slice."""
    import numpy as np

    pdf = pdf.sort_values(["ts_us", "src_ip", "src_port", "tcp_seq"], kind="mergesort")
    ts = pdf["ts_us"].to_numpy(dtype="int64")
    ln = pdf["length"].to_numpy(dtype="int64")
    proto = pdf["protocol"].to_numpy(dtype="int64")

    if acc is None:
        acc = {n: 0.0 for n in ACC_NAMES}
        for n in ("lenf_mn", "lenb_mn", "iatf_mn", "iatb_mn", "fiat_mn", "alen_mn"):
            acc[n] = float("inf")
        for n in ("lenf_mx", "lenb_mx", "iatf_mx", "iatb_mx", "fiat_mx", "alen_mx"):
            acc[n] = float("-inf")
        acc["first_ts"] = float(ts[0])
        acc["last_ts"] = float("nan")
        acc["last_fwd_ts"] = float("nan")
        acc["last_bwd_ts"] = float("nan")
        acc["prev_fwd_len"] = float("nan")
        acc["prev_bwd_len"] = float("nan")
        first = pdf.iloc[0]
        acc["sp"] = f"{first['src_ip']}:{int(first['src_port'])}"
        acc["src_is_flow_src"] = float(first["src_ip"] == key[0] and int(first["src_port"]) == int(key[1]))

    sp = acc["sp"]
    is_fwd = (
        pdf["src_ip"].astype(str) + ":" + pdf["src_port"].astype(int).astype(str)
    ).to_numpy() == sp

    def series(prefix: str, vals, mask=None):
        v = vals if mask is None else vals[mask]
        if len(v) == 0:
            return
        acc[f"{prefix}_n"] += len(v)
        acc[f"{prefix}_s"] += float(v.sum())
        acc[f"{prefix}_q"] += float((v.astype("float64") ** 2).sum())
        acc[f"{prefix}_mn"] = min(acc[f"{prefix}_mn"], float(v.min()))
        acc[f"{prefix}_mx"] = max(acc[f"{prefix}_mx"], float(v.max()))

    import numpy as np

    series("lenf", ln, is_fwd)
    series("lenb", ln, ~is_fwd)
    series("alen", ln)

    # whole-flow IATs: diffs within batch + bridge from last_ts
    all_prev = np.empty_like(ts)
    all_prev[1:] = ts[:-1]
    bridge = acc["last_ts"]
    all_prev[0] = int(bridge) if bridge == bridge else -1  # NaN check
    fiat = (ts - all_prev)[all_prev >= 0].astype("float64")
    series("fiat", fiat)

    # per-direction IATs
    for dname, mask, last_key in (("iatf", is_fwd, "last_fwd_ts"), ("iatb", ~is_fwd, "last_bwd_ts")):
        dts = ts[mask]
        if len(dts) == 0:
            continue
        prev = np.empty_like(dts)
        prev[1:] = dts[:-1]
        lb = acc[last_key]
        prev[0] = int(lb) if lb == lb else -1
        diat = (dts - prev)[prev >= 0].astype("float64")
        series(dname, diat)
        acc[last_key] = float(dts[-1])

    acc["last_ts"] = float(ts[-1])

    # flags / headers / activity
    def colsum(c, mask=None):
        v = pdf[c].fillna(0).to_numpy(dtype="float64")
        if mask is not None:
            v = v[mask]
        return float(v.sum())

    acc["fin"] += colsum("fin_flag"); acc["syn"] += colsum("syn_flag")
    acc["rst"] += colsum("rst_flag"); acc["psh"] += colsum("psh_flag")
    acc["ack"] += colsum("ack_flag"); acc["urg"] += colsum("urg_flag")
    acc["cwe"] += colsum("cwr_flag"); acc["ece"] += colsum("ece_flag")
    acc["fwd_psh"] += colsum("psh_flag", is_fwd); acc["bwd_psh"] += colsum("psh_flag", ~is_fwd)
    acc["fwd_urg"] += colsum("urg_flag", is_fwd); acc["bwd_urg"] += colsum("urg_flag", ~is_fwd)
    hdr = np.where(proto == 6, 20, 8).astype("float64")
    acc["fwd_hdr"] += float(hdr[is_fwd].sum()); acc["bwd_hdr"] += float(hdr[~is_fwd].sum())
    act = ((pdf["tcp_len"].fillna(0) > 0) | (pdf["udp_len"].fillna(0) > 0)).to_numpy()
    acc["act_fwd"] += float(act[is_fwd].sum())

    # bulk runs: a run starts when length > 1000 and the previous packet
    # of the SAME direction was ≤ 1000 (or absent)
    for dname, mask, prev_key in (("fwd", is_fwd, "prev_fwd_len"), ("bwd", ~is_fwd, "prev_bwd_len")):
        dl = ln[mask].astype("float64")
        if len(dl) == 0:
            continue
        prev = np.empty_like(dl)
        prev[1:] = dl[:-1]
        pl = acc[prev_key]
        prev[0] = pl if pl == pl else 0.0
        bulk = dl > 1000
        acc[f"{dname}_bulk_b"] += float(dl[bulk].sum())
        acc[f"{dname}_bulk_p"] += float(bulk.sum())
        acc[f"{dname}_bulk_e"] += float((bulk & (prev <= 1000)).sum())
        acc[prev_key] = float(dl[-1])

    return acc


def _emit_row(acc: dict, key: tuple, final: bool) -> list:
    """Accumulators → one 85-col feature row (faithful int-cast mode)."""
    import math

    def ii(x):
        return int(x) if x == x and abs(x) != float("inf") else 0

    def mean(p):
        n = acc[f"{p}_n"]
        return acc[f"{p}_s"] / n if n else 0.0

    def std(p):
        n = acc[f"{p}_n"]
        if not n:
            return 0.0
        m = acc[f"{p}_s"] / n
        v = acc[f"{p}_q"] / n - m * m
        return math.sqrt(v) if v > 0 else 0.0

    def mn(p):
        v = acc[f"{p}_mn"]
        return v if v != float("inf") else 0

    def mx(p):
        v = acc[f"{p}_mx"]
        return v if v != float("-inf") else 0

    fwd_is_src = acc["src_is_flow_src"] >= 0.5
    src_ip, src_port = (key[0], key[1]) if fwd_is_src else (key[2], key[3])
    dst_ip, dst_port = (key[2], key[3]) if fwd_is_src else (key[0], key[1])
    proto = int(key[4])
    fwdp, bwdp = int(acc["lenf_n"]), int(acc["lenb_n"])
    fwdb, bwdb = acc["lenf_s"], acc["lenb_s"]
    dur = max((acc["last_ts"] - acc["first_ts"]) / 1e6, 0.001)
    import datetime as dt

    # tz-AWARE instant: a naive datetime would be reinterpreted in the
    # session timezone on the JVM side, shifting flow timestamps under
    # any non-UTC session (the batch paths use tz-independent micros)
    last_ts = dt.datetime.fromtimestamp(acc["last_ts"] / 1e6, tz=dt.timezone.utc)

    row = dict(
        flow_id=f"{src_ip}:{src_port}-{dst_ip}:{dst_port}-{proto}",
        source_ip=src_ip, source_port=int(src_port),
        destination_ip=dst_ip, destination_port=int(dst_port),
        protocol=proto,
        timestamp=last_ts,
        total_fwd_packets=fwdp, total_backward_packets=bwdp,
        total_length_of_fwd_packets=ii(fwdb), total_length_of_bwd_packets=ii(bwdb),
        fwd_packet_length_max=ii(mx("lenf")), fwd_packet_length_min=ii(mn("lenf")),
        fwd_packet_length_mean=ii(mean("lenf")), fwd_packet_length_std=ii(std("lenf")),
        bwd_packet_length_max=ii(mx("lenb")), bwd_packet_length_min=ii(mn("lenb")),
        bwd_packet_length_mean=ii(mean("lenb")), bwd_packet_length_std=ii(std("lenb")),
        flow_bytes_s=ii((fwdb + bwdb) / dur), flow_packets_s=ii((fwdp + bwdp) / dur),
        flow_iat_mean=ii(mean("fiat")), flow_iat_std=ii(std("fiat")),
        flow_iat_max=ii(mx("fiat")), flow_iat_min=ii(mn("fiat")),
        fwd_iat_total=ii(acc["iatf_s"]), fwd_iat_mean=ii(mean("iatf")),
        fwd_iat_std=ii(std("iatf")), fwd_iat_max=ii(mx("iatf")), fwd_iat_min=ii(mn("iatf")),
        bwd_iat_total=ii(acc["iatb_s"]), bwd_iat_mean=ii(mean("iatb")),
        bwd_iat_std=ii(std("iatb")), bwd_iat_max=ii(mx("iatb")), bwd_iat_min=ii(mn("iatb")),
        fwd_psh_flags=ii(acc["fwd_psh"]), bwd_psh_flags=ii(acc["bwd_psh"]),
        fwd_urg_flags=ii(acc["fwd_urg"]), bwd_urg_flags=ii(acc["bwd_urg"]),
        fwd_header_length=ii(acc["fwd_hdr"]), bwd_header_length=ii(acc["bwd_hdr"]),
        fwd_packets_s=ii(fwdp / dur), bwd_packets_s=ii(bwdp / dur),
        min_packet_length=ii(mn("alen")), max_packet_length=ii(mx("alen")),
        packet_length_mean=ii(mean("alen")), packet_length_std=ii(std("alen")),
        # int() of the FLOAT std squared (reference main.py:911 floors
        # the variance, not the already-floored std)
        packet_length_variance=ii(std("alen") ** 2),
        fin_flag_count=ii(acc["fin"]), syn_flag_count=ii(acc["syn"]),
        rst_flag_count=ii(acc["rst"]), psh_flag_count=ii(acc["psh"]),
        ack_flag_count=ii(acc["ack"]), urg_flag_count=ii(acc["urg"]),
        cwe_flag_count=ii(acc["cwe"]), ece_flag_count=ii(acc["ece"]),
        down_up_ratio=ii(bwdb / fwdb) if fwdb > 0 else 0,
        average_packet_size=ii(mean("alen")),
        avg_fwd_segment_size=ii(mean("lenf")), avg_bwd_segment_size=ii(mean("lenb")),
        fwd_avg_bytes_bulk=ii(acc["fwd_bulk_b"] / acc["fwd_bulk_e"]) if acc["fwd_bulk_e"] else 0,
        fwd_avg_packets_bulk=ii(acc["fwd_bulk_p"] / acc["fwd_bulk_e"]) if acc["fwd_bulk_e"] else 0,
        fwd_avg_bulk_rate=ii(acc["fwd_bulk_b"] / dur),
        bwd_avg_bytes_bulk=ii(acc["bwd_bulk_b"] / acc["bwd_bulk_e"]) if acc["bwd_bulk_e"] else 0,
        bwd_avg_packets_bulk=ii(acc["bwd_bulk_p"] / acc["bwd_bulk_e"]) if acc["bwd_bulk_e"] else 0,
        bwd_avg_bulk_rate=ii(acc["bwd_bulk_b"] / dur),
        subflow_fwd_packets=fwdp, subflow_fwd_bytes=ii(fwdb),
        subflow_bwd_packets=bwdp, subflow_bwd_bytes=ii(bwdb),
        init_win_bytes_forward=0, init_win_bytes_backward=0,
        act_data_pkt_fwd=ii(acc["act_fwd"]), min_seg_size_forward=0,
        active_mean=0, active_std=0, active_max=0, active_min=0,
        idle_mean=0, idle_std=0, idle_max=0, idle_min=0,
        is_final=final,
    )
    return [row.get(f) for f in _OUT_FIELDS]


def _make_update_fn(timeout_ms: int):
    def update(key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as pd

        def load() -> dict | None:
            if not state.exists:
                return None
            return unpack_state(state.get)

        if state.hasTimedOut:
            acc = load()
            state.remove()
            if acc is not None:
                yield pd.DataFrame([_emit_row(acc, key, True)], columns=_OUT_FIELDS)
            return

        acc = load()
        for pdf in pdfs:
            if len(pdf):
                acc = _update_accumulators(acc, pdf, key)
        if acc is None:
            return
        state.update(pack_state(acc))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([_emit_row(acc, key, False)], columns=_OUT_FIELDS)

    return update


def stateful_flow_features_accum(
    packets: DataFrame, timeout_ms: int = DEFAULT_TIMEOUT_MS
) -> DataFrame:
    """Update-mode flow features with O(1) per-flow state."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.features_array import pkt_struct

    flat_keys = [k for k in FLOW_KEY_COLS if k != "protocol"]
    keyed = (
        normalize_flow_key(packets)
        .select(*flat_keys, pkt_struct().alias("p"))
        .select(*flat_keys, "p.*")
    )
    return keyed.groupBy(*FLOW_KEY_COLS).applyInPandasWithState(
        _make_update_fn(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
