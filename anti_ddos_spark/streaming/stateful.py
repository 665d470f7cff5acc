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
limit_array_size cap (main.py:288-292), but we cap at the *oldest*
packets dropped... no: we keep the FIRST max_pkts (first-seen
orientation and init stats depend on the head; the reference keeps the
tail and silently corrupts first-packet semantics — documented
divergence).
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

STATE_SCHEMA = T.StructType(
    [T.StructField("pkts", T.ArrayType(PKT_STRUCT_T), True)]
)


def _output_schema(key_cols: list[str]) -> T.StructType:
    return T.StructType(
        [T.StructField(k, _KEY_T.get(k, T.StringType()), True) for k in key_cols]
        + [
            T.StructField("pkts", T.ArrayType(PKT_STRUCT_T), True),
            T.StructField("is_final", T.BooleanType(), False),
        ]
    )


def _make_update_fn(timeout_ms: int, max_pkts: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def emit(pkts: list[tuple], final: bool) -> pd.DataFrame:
            return pd.DataFrame(
                [(*key, [tuple(p) for p in pkts], final)],
                columns=[*FLOW_KEY_COLS, "pkts", "is_final"],
            )

        if state.hasTimedOut:
            (pkts,) = state.get
            state.remove()
            yield emit(list(pkts), True)
            return

        new_rows: list[tuple] = []
        for pdf in pdfs:
            new_rows.extend(pdf[PKT_FIELDS].itertuples(index=False, name=None))
        old = list(state.get[0]) if state.exists else []
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
            pkts = pkts[:max_pkts]
        state.update((pkts,))
        state.setTimeoutDuration(timeout_ms)
        yield emit(pkts, False)

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
    return grouped.select(*array_flow_features(F.col("pkts")), "is_final")
