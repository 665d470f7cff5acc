"""Bucketed-table co-located joins: the shuffle is paid once, at write
time. Proves the 100 TB claim on the real catalog path — two tables
bucketed on the same key join as SortMergeJoin with ZERO Exchange."""

from __future__ import annotations

import os
import tempfile

import pytest

from anti_ddos_spark.plans import plan_summary
from anti_ddos_spark.sources.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", buckets=8, key="custkey",
        path=os.path.join(tmp, "b_orders"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", buckets=8, key="custkey",
        path=os.path.join(tmp, "b_customer"),
    )
    yield "b_orders", "b_customer"
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, left, right, "custkey")
        s = plan_summary(j)
        assert s["n_sortmerge_joins"] == 1, s["text"][:1500]
        assert s["n_shuffle_exchanges"] == 0, (
            "co-bucketed join must not shuffle:\n" + s["text"][:1500]
        )
        # Since SPARK-28210 the scan's sort order is only trusted behind
        # the legacy conf (and only with one file per bucket — which
        # write_bucketed's repartition guarantees): with it on, the
        # write-time sortBy also elides both Sorts.
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        try:
            s2 = plan_summary(bucketed_join(spark, left, right, "custkey"))
            assert s2["n_sorts"] == 0, s2["text"][:1500]
            assert s2["n_shuffle_exchanges"] == 0
        finally:
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join(spark, left, right, "custkey")
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    )
    assert j.count() == plain.count()


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key reuses the on-disk hash partitioning:
    the aggregate runs with no Exchange at all."""
    from pyspark.sql import functions as F

    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("custkey").agg(F.count("*").alias("n"))
    s = plan_summary(agg)
    assert s["n_shuffle_exchanges"] == 0, s["text"][:1500]
