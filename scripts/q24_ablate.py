"""Attribute the q24 steady-state drift (VERDICT r4 #2, 5.6 s vs 3.85 s r2).

Measures q24 at $SPARK_GRAFT_SF_DIR (default sf0.1) under ablations of the
events load path — the only code that changed between r2 and r4 on q24's
lineage (the flow plan itself is pinned by tests/test_plans.py):

  cur     — t(): nanosAsLong conf + NTZ->LTZ cast (round-4 dtype-adaptive)
  ntz     — raw read, ts kept TIMESTAMP_NTZ end-to-end (no cast)
  cast_ts — raw read + .cast("timestamp") but WITHOUT the nanosAsLong conf
  long_us — ts decoded as raw int64 us + timestamp_micros() (r2's shape:
            in r2 the data was TIMESTAMP(NANOS), forced to a long read;
            emulated here by casting NTZ->long->timestamp_micros)

Each variant: 1 warm run + N timed runs, median reported. Run on a QUIET
box (pgrep java first) — same contention caveat as bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anti_ddos_spark.queries.base import t
from anti_ddos_spark.queries.flow import FLOW_GAP_S, events_as_packets
from anti_ddos_spark.sessionize import flow_features
from anti_ddos_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("Q24_ABLATE_RUNS", "3"))


def q24_from(ev):
    packets = events_as_packets(ev)
    flows = flow_features(packets, gap_s=FLOW_GAP_S, mode="faithful")
    return flows.select(
        "*", F.unix_micros("timestamp").alias("last_ts_us")
    ).drop("timestamp")


def run(df) -> float:
    t0 = time.perf_counter()
    df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*df.columns))).collect()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="q24_ablate")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(SF_DIR, "events.parquet")

    def load_cur():
        return t(spark, SF_DIR, "events")

    def load_ntz():
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        return spark.read.parquet(path)

    def load_cast_ts():
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        raw = spark.read.parquet(path)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))

    def load_long_us():
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        raw = spark.read.parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.col("ts").cast("long"))
        )

    variants = {
        "cur": load_cur,
        "ntz": load_ntz,
        "cast_ts": load_cast_ts,
        "long_us": load_long_us,
    }
    out = {}
    for name, load in variants.items():
        try:
            df = q24_from(load())
            run(df)  # warm: codegen compile
            times = [run(q24_from(load())) for _ in range(RUNS)]
            out[name] = {
                "median": round(statistics.median(times), 3),
                "runs": [round(x, 3) for x in times],
            }
        except Exception as exc:  # a variant may be type-incompatible
            out[name] = {"error": str(exc).splitlines()[0][:200]}
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "variants": out}))


if __name__ == "__main__":
    main()
