"""Runtime bloom-filter join reduction (the 100 TB scan-cutting AQE
feature): a selective dimension filter is compiled into a bloom filter
applied to the FACT side before its shuffle, so most fact rows never
leave the scan stage.

Spark injects it only where it pays: shuffle joins (a broadcast join
already filters at the scan via the hash relation) with an application
side bigger than `applicationSideScanSizeThreshold` (default 10 GB —
i.e. at REAL scale, not on the sf0.01 fixture). The test emulates the
at-scale decision by lowering the size thresholds, then pins (a) the
physical plan carries `bloom_filter_agg` (creation over the filtered
dim) and a `might_contain` Filter on the fact scan side, and (b) the
results are identical with and without the injection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
    )


def test_bloom_filter_injected_and_result_identical(spark):
    baseline = {tuple(r) for r in _join(spark).collect()}
    old = {k: spark.conf.get(k) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        df = _join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        # the probe must sit on the fact (lineitem) key, the creation on
        # the filtered dim (orders) key
        probe = next(l for l in plan.splitlines() if "might_contain" in l)
        assert "l_orderkey" in probe, probe
        create = next(l for l in plan.splitlines() if "bloom_filter_agg" in l)
        assert "o_orderkey" in create, create
        got = {tuple(r) for r in df.collect()}
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert got == baseline and got
