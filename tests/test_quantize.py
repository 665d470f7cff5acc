"""int8 embedding quantization: reconstruction quality + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def test_int8_topk_recall(spark):
    """Cosine top-k over int8-reconstructed vectors recovers almost all
    of the exact top-k — the property that makes the 4x/8x memory saving
    usable for corpus-scale ANN."""
    from anti_ddos_spark.operators.similarity import (
        brute_force_topk,
        dequantize_int8,
        quantize_int8,
    )

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    k = 10
    exact = {r["vec_id"] for r in brute_force_topk(emb, 100, k=k).collect()}

    recon = quantize_int8(emb).select(
        "vec_id",
        dequantize_int8(F.col("codes"), F.col("scale")).alias("embedding"),
    )
    approx = {r["vec_id"] for r in brute_force_topk(recon, 100, k=k).collect()}
    assert len(exact & approx) >= 8, (exact, approx)


def test_quantize_codes_bounded_and_scale_exact(spark):
    from anti_ddos_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    q = quantize_int8(emb)
    bad = q.select(
        F.size(F.filter("codes", lambda c: (c > 127) | (c < -127))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert bad == 0
    # max-abs element quantizes to exactly +/-127
    hits = (
        q.select(F.array_max(F.transform("codes", F.abs)).alias("m"))
        .filter(F.col("m") == 127)
        .count()
    )
    assert hits == q.count()


def test_quantize_plan_is_narrow(spark):
    """Zero-shuffle claim: no Exchange in the physical plan."""
    from anti_ddos_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    plan = quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
