"""AQE skew-join splitting: the runtime answer to hot keys at 100 TB.

Builds a join where one key owns ~90% of the left side, forces the
sort-merge path with thresholds low enough for the toy data, and
asserts OptimizeSkewedJoin actually split the hot partition (the
`isSkew=true`/`skew=` marker in the final adaptive plan). Complements
the salting strategy (q28/operators/skew.py) — salting is the
plan-time fix, AQE splitting the run-time one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(skew_conf):
    spark = skew_conf
    # left: 200k rows, 90% on key 0; right: 200 distinct keys
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(200)))
        .alias("k"),
        F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("v"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), F.col("id").alias("meta")
    )
    j = left.join(right, "k")
    # plan_summary(execute=True) collects THIS DataFrame so the final
    # adaptive plan (with runtime skew splits) is what gets explained —
    # a fresh .count() would build a separate, un-finalized plan
    from anti_ddos_spark.plans import plan_summary

    s = plan_summary(j, execute=True)
    final = s["text"]
    assert "skew=true" in final or "isSkew=true" in final, final[:2000]
