"""Update-mode stateful flow sessionizer (applyInPandasWithState).

API-parity twin of the reference's centerpiece operator
(spark_app/main.py:254-990, 1047-1053): per-flow state with
processing-time timeout, emitting a refreshed row per touched key per
micro-batch (partial) and a final row when the key idles past the
timeout — the reference marks finality by suffixing "_TIMEOUT" onto
flow_id (main.py:407-411); we emit an ``is_final`` boolean instead
(SURVEY §2.7).

Design inversion vs the reference: its 740-line UDF computes all 77
features procedurally in pandas. Ours keeps the Python worker to STATE
BOOKKEEPING ONLY — accumulate the flow's packet tuples, handle the
timeout — and emits the packet array; the 77 features are then computed
by the Catalyst array-expression library (features_array) as an ordinary
projection on the stream. Python touches each packet once; all math is
JVM-side and shared verbatim with the batch/session_window paths.

State is the packet array itself (typed array<struct>, not the
reference's JSON-in-string smuggling — main.py:163,173-175). Memory per
key is bounded by ``max_pkts`` mirroring the reference's
limit_array_size cap (main.py:288-292), except we keep the FIRST
max_pkts (first-seen orientation and init stats depend on the head; the
reference keeps the tail and silently corrupts first-packet semantics —
documented divergence).

Cap semantics mirror the reference's for the *totals* (main.py:288-292
caps only the stat arrays while scalar counters stay exact): once a flow
overflows ``max_pkts``, the state grows a small struct of exact scalar
counters (packet/byte/flag totals, ts and length extrema — ~21 longs)
that every subsequent packet updates, and the JVM-side projection
overrides the additive features from those counters. Distributional
statistics (std, IATs, bulk episodes) remain head-windowed over the
capped array — callers needing them exact on unbounded flows use the
O(1)-state accumulator variant (stateful_accum).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from anti_ddos_spark.features_array import PKT_FIELDS, array_flow_features
from anti_ddos_spark.normalize import FLOW_KEY_COLS, normalize_flow_key

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

DEFAULT_TIMEOUT_MS = 60_000  # reference: state.setTimeoutDuration(60000), main.py:981
DEFAULT_MAX_PKTS = 100_000   # state cap per flow (reference caps arrays at 1000)

_PKT_TYPES: dict[str, T.DataType] = {
    "ts_us": T.LongType(),
    "src_ip": T.StringType(),
    "src_port": T.IntegerType(),
    "dst_ip": T.StringType(),
    "dst_port": T.IntegerType(),
    "tcp_seq": T.IntegerType(),
    "length": T.LongType(),
    "protocol": T.IntegerType(),
    "tcp_win": T.IntegerType(),
    "tcp_len": T.IntegerType(),
    "udp_len": T.IntegerType(),
    **{f: T.IntegerType() for f in (
        "fin_flag", "syn_flag", "rst_flag", "psh_flag",
        "ack_flag", "urg_flag", "cwr_flag", "ece_flag",
    )},
}

PKT_STRUCT_T = T.StructType(
    [T.StructField(n, _PKT_TYPES[n], True) for n in PKT_FIELDS]
)

_KEY_T = {"flow_src_ip": T.StringType(), "flow_src_port": T.IntegerType(),
          "flow_dst_ip": T.StringType(), "flow_dst_port": T.IntegerType(),
          "protocol": T.IntegerType()}

# Exact overflow counters (None until the flow exceeds max_pkts).
CTR_FIELDS = [
    "n_fwd", "n_bwd", "bytes_fwd", "bytes_bwd",
    "fin", "syn", "rst", "ack", "cwr", "ece",
    "psh_fwd", "psh_bwd", "urg_fwd", "urg_bwd",
    "act_data_fwd", "min_ts", "max_ts",
    "fwd_len_max", "fwd_len_min", "bwd_len_max", "bwd_len_min",
]
CTR_STRUCT_T = T.StructType([T.StructField(n, T.LongType(), True) for n in CTR_FIELDS])

STATE_SCHEMA = T.StructType(
    [
        T.StructField("pkts", T.ArrayType(PKT_STRUCT_T), True),
        T.StructField("ctr", CTR_STRUCT_T, True),
    ]
)


def _output_schema(key_cols: list[str]) -> T.StructType:
    return T.StructType(
        [T.StructField(k, _KEY_T.get(k, T.StringType()), True) for k in key_cols]
        + [
            T.StructField("pkts", T.ArrayType(PKT_STRUCT_T), True),
            T.StructField("ctr", CTR_STRUCT_T, True),
            T.StructField("is_final", T.BooleanType(), False),
        ]
    )


def _count_rows(rows: list[tuple], fwd_ip, fwd_port) -> tuple:
    """Exact scalar counters over packet tuples, vectorized via pandas.

    Orientation (fwd = matches the flow head's src endpoint) is frozen by
    the caller before the first overflow, so per-direction sums stay
    consistent across micro-batches.
    """
    import pandas as pd

    df = pd.DataFrame(rows, columns=PKT_FIELDS)
    is_fwd = (df["src_ip"] == fwd_ip) & (df["src_port"] == fwd_port)
    f, b = df[is_fwd], df[~is_fwd]

    def s(frame, col) -> int:
        return int(frame[col].fillna(0).sum())

    def mx(frame, col):
        return int(frame[col].max()) if len(frame) else None

    def mn(frame, col):
        return int(frame[col].min()) if len(frame) else None

    act = int(((f["tcp_len"].fillna(0) > 0) | (f["udp_len"].fillna(0) > 0)).sum())
    return (
        len(f), len(b), s(f, "length"), s(b, "length"),
        s(df, "fin_flag"), s(df, "syn_flag"), s(df, "rst_flag"),
        s(df, "ack_flag"), s(df, "cwr_flag"), s(df, "ece_flag"),
        s(f, "psh_flag"), s(b, "psh_flag"), s(f, "urg_flag"), s(b, "urg_flag"),
        act, mn(df, "ts_us"), mx(df, "ts_us"),
        mx(f, "length"), mn(f, "length"), mx(b, "length"), mn(b, "length"),
    )


def _merge_ctr(a: tuple, b: tuple) -> tuple:
    def opt(fn, x, y):
        vals = [v for v in (x, y) if v is not None]
        return fn(vals) if vals else None

    sums = tuple(a[i] + b[i] for i in range(15))
    return sums + (
        opt(min, a[15], b[15]), opt(max, a[16], b[16]),
        opt(max, a[17], b[17]), opt(min, a[18], b[18]),
        opt(max, a[19], b[19]), opt(min, a[20], b[20]),
    )


def _make_update_fn(timeout_ms: int, max_pkts: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def emit(pkts: list[tuple], ctr, final: bool) -> pd.DataFrame:
            return pd.DataFrame(
                [(*key, [tuple(p) for p in pkts], ctr, final)],
                columns=[*FLOW_KEY_COLS, "pkts", "ctr", "is_final"],
            )

        if state.hasTimedOut:
            pkts, ctr = state.get
            state.remove()
            yield emit(list(pkts), tuple(ctr) if ctr is not None else None, True)
            return

        new_rows: list[tuple] = []
        for pdf in pdfs:
            new_rows.extend(pdf[PKT_FIELDS].itertuples(index=False, name=None))
        if state.exists:
            stored = state.get
            old, ctr = list(stored[0]), stored[1]
            ctr = tuple(ctr) if ctr is not None else None
        else:
            old, ctr = [], None

        if ctr is not None:
            # Already overflowed: the capped head (and its orientation) is
            # frozen; just fold the new packets into the exact counters.
            pkts = old
            if new_rows:
                ctr = _merge_ctr(
                    ctr, _count_rows(new_rows, pkts[0][1], pkts[0][2])
                )
        else:
            pkts = old + new_rows
            # keep timestamp order (micro-batches may interleave; the batch
            # path sorts identically via ORDER_COLS = struct field order).
            # The key stops at tcp_seq with None/NaN normalized: state rows
            # carry None for null ints while fresh pandas rows carry NaN, and
            # a bare tuple sort would compare None < float on a timestamp tie
            # and raise TypeError, killing the query.
            def _key(p):
                seq = p[5]
                seq = -1 if seq is None or seq != seq else int(seq)
                return (p[0], p[1], p[2], p[3], p[4], seq)

            pkts.sort(key=_key)
            if len(pkts) > max_pkts:
                # First overflow: snapshot exact counters over the FULL
                # merged list (orientation = sorted head, which survives
                # the truncation and is therefore frozen from here on).
                ctr = _count_rows(pkts, pkts[0][1], pkts[0][2])
                pkts = pkts[:max_pkts]
        state.update((pkts, ctr))
        state.setTimeoutDuration(timeout_ms)
        yield emit(pkts, ctr, False)

    return update


def stateful_flow_features(
    packets: DataFrame,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    max_pkts: int = DEFAULT_MAX_PKTS,
) -> DataFrame:
    """Streaming packets → update-mode flow feature rows.

    Emits one refreshed 85-col row per touched flow per micro-batch with
    ``is_final=false``, then a last row with ``is_final=true`` when the
    flow sees no packets for ``timeout_ms`` of processing time. Use with
    ``outputMode("update")``. Downstream consumers that only want
    completed flows filter ``is_final`` (the reference's
    `_TIMEOUT`-suffix filter, main.py:1077).
    """
    from anti_ddos_spark.features_array import pkt_struct  # field-aligned projection

    # `protocol` is both a flow-key column and a packet field (the
    # normalized key keeps the packet's protocol verbatim), so flatten
    # the struct and let the key's protocol resolve to the packet field.
    flat_keys = [k for k in FLOW_KEY_COLS if k != "protocol"]
    keyed = normalize_flow_key(packets).select(
        *flat_keys, pkt_struct().alias("p")
    ).select(*flat_keys, "p.*")

    grouped = keyed.groupBy(*FLOW_KEY_COLS).applyInPandasWithState(
        _make_update_fn(timeout_ms, max_pkts),
        outputStructType=_output_schema(list(FLOW_KEY_COLS)),
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    out = grouped.select(*array_flow_features(F.col("pkts")), F.col("ctr"), "is_final")
    # surface the cap: totals stay exact past max_pkts (the overrides),
    # but distributional stats (std/IAT/bulk/variance) are head-windowed
    # — without this flag an overflowed row is indistinguishable from a
    # fully-exact one, and consumers can't route elephant flows to the
    # accumulator path (stateful_accum, exact at any length)
    return (
        _apply_overflow_overrides(out)
        .withColumn("overflowed", F.col("ctr").isNotNull())
        .drop("ctr")
    )


def _apply_overflow_overrides(out: DataFrame) -> DataFrame:
    """Override additive features from the exact counter struct when the
    flow overflowed ``max_pkts`` (ctr non-null); otherwise the pure
    array-derived value stands. Mirrors the reference's cap semantics:
    scalar totals exact, distributional stats windowed (main.py:288-292).
    """
    from anti_ddos_spark.features_array import _int, _long

    c = F.col("ctr")
    n_fwd, n_bwd = c["n_fwd"], c["n_bwd"]
    by_f, by_b = c["bytes_fwd"], c["bytes_bwd"]
    n_tot, by_tot = n_fwd + n_bwd, by_f + by_b
    dur_s = F.greatest(
        (c["max_ts"] - c["min_ts"]) / F.lit(1_000_000.0), F.lit(0.001)
    )
    hdr_sz = F.when(F.col("protocol") == 6, F.lit(20)).otherwise(F.lit(8)).cast("long")

    def mean(total: F.Column, n: F.Column) -> F.Column:
        return _long(F.when(n > 0, total.cast("double") / n))

    overrides: dict[str, F.Column] = {
        "total_fwd_packets": _int(n_fwd),
        "total_backward_packets": _int(n_bwd),
        "total_length_of_fwd_packets": by_f,
        "total_length_of_bwd_packets": by_b,
        "fwd_packet_length_max": _long(c["fwd_len_max"]),
        "fwd_packet_length_min": _long(c["fwd_len_min"]),
        "fwd_packet_length_mean": mean(by_f, n_fwd),
        "bwd_packet_length_max": _long(c["bwd_len_max"]),
        "bwd_packet_length_min": _long(c["bwd_len_min"]),
        "bwd_packet_length_mean": mean(by_b, n_bwd),
        "flow_bytes_s": _long(by_tot / dur_s),
        "flow_packets_s": _long(n_tot / dur_s),
        "fwd_psh_flags": _int(c["psh_fwd"]),
        "bwd_psh_flags": _int(c["psh_bwd"]),
        "fwd_urg_flags": _int(c["urg_fwd"]),
        "bwd_urg_flags": _int(c["urg_bwd"]),
        "fwd_header_length": _int(n_fwd * hdr_sz),
        "bwd_header_length": _int(n_bwd * hdr_sz),
        "fwd_packets_s": _long(n_fwd / dur_s),
        "bwd_packets_s": _long(n_bwd / dur_s),
        "min_packet_length": _long(
            F.least(F.coalesce(c["fwd_len_min"], c["bwd_len_min"]),
                    F.coalesce(c["bwd_len_min"], c["fwd_len_min"]))
        ),
        "max_packet_length": _long(
            F.greatest(F.coalesce(c["fwd_len_max"], c["bwd_len_max"]),
                       F.coalesce(c["bwd_len_max"], c["fwd_len_max"]))
        ),
        "packet_length_mean": mean(by_tot, n_tot),
        "fin_flag_count": _int(c["fin"]),
        "syn_flag_count": _int(c["syn"]),
        "rst_flag_count": _int(c["rst"]),
        "psh_flag_count": _int(c["psh_fwd"] + c["psh_bwd"]),
        "ack_flag_count": _int(c["ack"]),
        "urg_flag_count": _int(c["urg_fwd"] + c["urg_bwd"]),
        "cwe_flag_count": _int(c["cwr"]),
        "ece_flag_count": _int(c["ece"]),
        "down_up_ratio": _long(
            F.when(by_f > 0, by_b.cast("double") / by_f).otherwise(F.lit(0.0))
        ),
        "average_packet_size": mean(by_tot, n_tot),
        "avg_fwd_segment_size": mean(by_f, n_fwd),
        "avg_bwd_segment_size": mean(by_b, n_bwd),
        "subflow_fwd_packets": _int(n_fwd),
        "subflow_fwd_bytes": _int(by_f),
        "subflow_bwd_packets": _int(n_bwd),
        "subflow_bwd_bytes": _int(by_b),
        "act_data_pkt_fwd": _int(c["act_data_fwd"]),
        "timestamp": F.timestamp_micros(c["max_ts"]),
    }
    return out.withColumns(
        {
            name: F.when(c.isNotNull(), expr).otherwise(F.col(name))
            for name, expr in overrides.items()
        }
    )
