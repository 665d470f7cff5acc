"""ADC (asymmetric distance) top-k over PQ codes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def _data_codebook(spark, m=8, k=4):
    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    rows = (
        emb.filter(F.col("vec_id").between(1, k)).orderBy("vec_id").collect()
    )
    dim = len(rows[0]["embedding"])
    sd = dim // m
    return [
        [[float(x) for x in r["embedding"][j * sd : (j + 1) * sd]] for r in rows]
        for j in range(m)
    ]


def test_adc_equals_lookup_identity(spark):
    """adc_dist2 must equal the independently recomputed sum over
    subspaces of ||q_j - center[code_j]||² — the PQ scoring contract."""
    from anti_ddos_spark.operators.similarity import pq_encode, pq_topk

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    centers = _data_codebook(spark)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 100).collect()[0]["embedding"]
    ]
    top = {r["vec_id"]: r["adc_dist2"] for r in pq_topk(emb, q, centers, k=5).collect()}
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, 8, 4, centers).filter(
            F.col("vec_id").isin(*top.keys())
        ).collect()
    }
    sd = len(centers[0][0])
    for vid, got in top.items():
        want = sum(
            sum(
                (q[j * sd + i] - centers[j][codes[vid][j]][i]) ** 2
                for i in range(sd)
            )
            for j in range(8)
        )
        assert abs(got - want) < 1e-9, (vid, got, want)


def test_adc_recovers_planted_structure(spark):
    """Vectors built exactly from codebook centers (zero noise) must be
    retrieved by ADC with distance 0 when the query shares their code
    pattern."""
    from anti_ddos_spark.operators.similarity import pq_topk

    m, k, sd = 4, 2, 2
    centers = [
        [[float(10 * j + c), float(-(10 * j + c))] for c in range(k)]
        for j in range(m)
    ]

    def vec(pattern):
        out = []
        for j, c in enumerate(pattern):
            out.extend(centers[j][c])
        return out

    rows = [
        (1, vec([0, 0, 0, 0])),
        (2, vec([0, 0, 0, 0])),
        (3, vec([1, 1, 1, 1])),
        (4, vec([1, 0, 1, 0])),
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    top = pq_topk(df, vec([0, 0, 0, 0]), centers, k=2).collect()
    assert {r["vec_id"] for r in top} == {1, 2}
    assert all(r["adc_dist2"] == 0.0 for r in top)


def test_adc_plan_is_narrow(spark):
    from anti_ddos_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    centers = _data_codebook(spark)
    q = [0.0] * 64
    plan = (
        pq_topk(emb, q, centers, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
