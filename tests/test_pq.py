"""Product-quantization encode: structural + monotone-error properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")


def test_codes_in_range_and_err_nonneg(spark):
    from anti_ddos_spark.operators.similarity import pq_encode

    out = pq_encode(_emb(spark), n_subspaces=8, n_centers=4)
    bad = out.filter(
        (F.size("codes") != 8)
        | (F.size(F.filter("codes", lambda c: (c < 0) | (c >= 4))) > 0)
        | (F.col("err") < 0)
    ).count()
    assert bad == 0
    # codebook vectors encode to themselves with zero error
    self_err = (
        out.filter(F.col("vec_id").between(1, 4))
        .agg(F.max("err"))
        .collect()[0][0]
    )
    assert self_err == 0.0


def test_more_centers_never_hurt(spark):
    """min over a superset of centers <= min over a subset, per row —
    the k=1 codebook (center 0 only) upper-bounds the k=4 error."""
    from anti_ddos_spark.operators.similarity import pq_encode

    emb = _emb(spark)
    e4 = pq_encode(emb, n_subspaces=8, n_centers=4).select(
        "vec_id", F.col("err").alias("err4")
    )
    e1 = pq_encode(emb, n_subspaces=8, n_centers=1).select(
        "vec_id", F.col("err").alias("err1")
    )
    worse = e4.join(e1, "vec_id").filter(F.col("err4") > F.col("err1")).count()
    assert worse == 0


def test_pq_plan_is_narrow_with_literal_codebook(spark):
    from anti_ddos_spark.operators.similarity import pq_encode

    emb = _emb(spark)
    plan = (
        pq_encode(emb, n_subspaces=8, n_centers=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
