"""Bucketed co-located join: the 100 TB shuffle-elimination technique.

Writing both fact tables bucketed by the join key lets Spark sort-merge
join them with ZERO Exchange — at cluster scale this converts the
biggest recurring shuffle (fact x fact) into a local merge per bucket.
Asserted here end-to-end: write bucketed tables, join, inspect the plan,
and check results against the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.plans import plan_summary
from anti_ddos_spark.queries.base import t

SF = "/root/testdata/sf0.01"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is static config — tables land in ./spark-warehouse
    # (gitignored) and are dropped in teardown
    li = t(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = t(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    for df, name in ((li, "li_bucketed"), (orders, "orders_bucketed")):
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, df.columns[0])
            .sortBy(df.columns[0])
            .saveAsTable(name)
        )
    yield spark.table("li_bucketed"), spark.table("orders_bucketed")
    for name in ("li_bucketed", "orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li_b, orders_b = bucketed
    # at sf0.01 orders fits the broadcast threshold and the planner skips
    # bucketing entirely; disable auto-broadcast to exercise the fact x
    # fact shape this technique exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        s = plan_summary(joined)
        assert s["n_sortmerge_joins"] == 1, s["text"][:1500]
        assert s["n_shuffle_exchanges"] == 0, (
            "bucketed fact x fact join must not shuffle:\n" + s["text"][:1500]
        )
        assert "Bucketed: true" in s["text"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    li_b, orders_b = bucketed
    bucketed_res = (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    li = t(spark, SF, "lineitem")
    orders = t(spark, SF, "orders")
    plain_res = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = sorted(map(str, bucketed_res.collect()))
    b = sorted(map(str, plain_res.collect()))
    assert a == b


def test_bucketed_agg_reuses_distribution(spark, bucketed):
    """groupBy on the bucket key should also avoid the shuffle."""
    li_b, _ = bucketed
    agg = li_b.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    s = plan_summary(agg)
    assert s["n_shuffle_exchanges"] == 0, s["text"][:1200]
