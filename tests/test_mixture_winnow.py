"""Temperature mixture sampling + winnowing fingerprint properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def test_temperature_flattens_mixture(spark):
    """tau<1 must shrink the spread of per-source shares: the largest
    source's share of the sample is below its share of the corpus, the
    smallest's above (modulo hash-threshold granularity)."""
    from anti_ddos_spark.queries.textops import q55_temperature_sample

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    raw = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    samp = {
        r["source"]: r["n"]
        for r in q55_temperature_sample(spark, SF_DIR_ORACLE)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_raw, n_samp = sum(raw.values()), sum(samp.values())
    big = max(raw, key=raw.get)
    small = min(raw, key=raw.get)
    if raw[big] > raw[small]:  # only meaningful on a skewed corpus
        assert samp[big] / n_samp < raw[big] / n_raw + 1e-9
        assert samp.get(small, 0) / n_samp > raw[small] / n_raw - 0.02
    # roughly the configured target size
    assert 0.35 * n_raw < n_samp < 0.65 * n_raw


def test_temperature_sample_plan_broadcasts_rates(spark):
    from anti_ddos_spark.queries.textops import q55_temperature_sample

    plan = (
        q55_temperature_sample(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_winnowing_shared_substring_guarantee(spark):
    """Schleimer et al.'s invariant: docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint."""
    from anti_ddos_spark.queries.textops import WINNOW_K, WINNOW_W

    shared = "x" * 0 + "the quick brown fox jumps over it"  # len 33 >= k+w-1
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"one two three {shared} four five six seven"),
        (3, "completely different content with no overlap at all here"),
    ]
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="winnow_t_")
    spark.createDataFrame(rows, "doc_id INT, text STRING").write.parquet(
        os.path.join(tmp, "documents.parquet")
    )

    from anti_ddos_spark.queries.textops import q56_winnow_fingerprints

    # recompute with full fingerprint sets (the query emits summaries)
    text = F.col("text")
    k, w = WINNOW_K, WINNOW_W
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text) - (k - 1)),
        lambda i: text.substr(i, F.lit(k)),
    )
    d = (
        spark.read.parquet(os.path.join(tmp, "documents.parquet"))
        .withColumn(
            "_h",
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            ),
        )
        .withColumn(
            "_mins",
            F.transform(
                F.sequence(F.lit(1), F.size("_h") - (w - 1)),
                lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
            ),
        )
        .select("doc_id", F.array_distinct("_mins").alias("fps"))
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in d.collect()}
    assert fps[1] & fps[2], "shared substring must yield a shared fingerprint"
    # the summary query runs and stays narrow
    plan = (
        q56_winnow_fingerprints(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
