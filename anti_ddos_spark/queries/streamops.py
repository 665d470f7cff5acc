"""Streaming queries registered as first-class oracle-checked entries.

q70 runs a REAL Structured Streaming query (parquet replay source →
session_window sessionizer → memory sink, Trigger.AvailableNow) inside
the query callable. Its output is deterministic: with a 0-second
watermark delay, append mode emits exactly the sessions whose end
(last packet + gap) precedes the final watermark (the global max
timestamp) — a predicate the DuckDB oracle can replicate, so the driver
hash-checks an actual streaming execution against batch SQL.

Excluded from the hash: the int-truncated stddev/variance features.
The streaming path computes std via the array-expression two-pass form,
the oracle via stddev_pop; the results differ by sub-ulp float noise
which the int() floor can amplify to ±1 (same reason
tests/test_streaming.py fuzzes those fields). Everything else — 70+
columns — is hash-exact.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from anti_ddos_spark.queries.base import Query, t
from anti_ddos_spark.queries.flow import FLOW_GAP_S, Q24_SQL, events_as_packets
from anti_ddos_spark.schemas import FLOW_SCHEMA
from anti_ddos_spark.streaming.sessionize_stream import streaming_flow_features

_counter = itertools.count()

STABLE_COLS = [
    f.name
    for f in FLOW_SCHEMA.fields
    if "std" not in f.name and "variance" not in f.name and f.name != "timestamp"
]


def q70_streaming_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    packets = events_as_packets(t(spark, sf, "events"))
    run_id = next(_counter)
    tmp = tempfile.mkdtemp(prefix="q70_stream_")
    src = os.path.join(tmp, "packets")
    packets.write.parquet(src)

    stream = spark.readStream.schema(packets.schema).parquet(src)
    flows = streaming_flow_features(
        stream, gap_s=FLOW_GAP_S, watermark="0 seconds"
    )
    name = f"q70_flows_{run_id}"
    q = (
        flows.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name)
    return out.select(
        *STABLE_COLS, F.unix_micros("timestamp").alias("last_ts_us")
    )


_STABLE_SQL_COLS = ", ".join([*STABLE_COLS, "last_ts_us"])

# the final watermark is the max event time; append emits sessions whose
# end (last_ts + gap) is strictly behind it
Q70_SQL = f"""
SELECT {_STABLE_SQL_COLS}
FROM ({Q24_SQL}) flows
WHERE last_ts_us + {FLOW_GAP_S * 1_000_000}
      < (SELECT max(epoch_us(ts)) FROM events)
"""


QUERIES: dict[str, Query] = {
    "q70_streaming_sessionize": Query(
        q70_streaming_sessionize,
        Q70_SQL,
        "REAL streaming execution (session_window, availableNow) hash-checked "
        "against batch SQL via the deterministic watermark-emission predicate",
    ),
}
