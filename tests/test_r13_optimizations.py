"""Round-13 optimization pins.

1. hyperplane_signatures was restructured from a crossJoin+groupBy plan
   to a literal per-row projection (one parsed SQL expression). The
   values must be IDENTICAL to the old aggregate form — re-derived here
   inline as the reference — including the null-vector → sig 0 path.
2. session.sized_stream_partitions must apply state_partitions_for for
   the duration of query creation and restore the previous value even
   on error; approx_key_count must be a sane cardinality estimate.
3. lsh_neardup_pairs' verification respread must fire only for small
   local scan inputs (the spread_small_scan gate class).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from anti_ddos_spark.operators.similarity import (
    dot,
    hyperplane_signatures,
)

DIM = 16
N = 30


def _vecs(spark, with_null: bool = False):
    rows = [
        (i, [float(((i * 11 + j * 5) % 17) - 8) / 8.0 for j in range(DIM)])
        for i in range(1, N + 1)
    ]
    if with_null:
        rows.append((N + 1, None))
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )


def _reference_sigs(df, n_bands, planes_per_band):
    """The pre-r13 crossJoin+groupBy signature computation, re-derived
    inline: broadcast the data planes, one dot per (vector, plane),
    sum of shiftleft bits per (id, band)."""
    from anti_ddos_spark.operators.similarity import as_double

    n_planes = n_bands * planes_per_band
    emb = df.select("vec_id", as_double(F.col("embedding")).alias("e"))
    planes = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= n_planes)
    ).select(F.col("vec_id").alias("pid"), F.col("e").alias("h"))
    return (
        emb.crossJoin(F.broadcast(planes))
        .withColumn(
            "band_id", F.floor((F.col("pid") - 1) / planes_per_band).cast("int")
        )
        .withColumn("idx", ((F.col("pid") - 1) % planes_per_band).cast("int"))
        .groupBy("vec_id", "band_id")
        .agg(
            F.sum(
                F.when(
                    dot(F.col("e"), F.col("h")) >= 0,
                    F.expr("shiftleft(1, idx)"),
                ).otherwise(0)
            ).alias("sig")
        )
    )


@pytest.mark.parametrize("n_bands,ppb", [(1, 8), (2, 4)])
def test_literal_sigs_match_crossjoin_aggregate_form(spark, n_bands, ppb):
    df = _vecs(spark)
    got = sorted(
        (r["vec_id"], r["band_id"], r["sig"])
        for r in hyperplane_signatures(df, n_bands, ppb, planes="data")
        .select("vec_id", "band_id", "sig")
        .collect()
    )
    want = sorted(
        (r["vec_id"], r["band_id"], r["sig"])
        for r in _reference_sigs(df, n_bands, ppb).collect()
    )
    assert got == want
    assert len(got) == N * n_bands


def test_literal_sigs_null_vector_gets_zero_sig(spark):
    """A null embedding's dots are null → every bit CASE falls to 0 —
    the same sig the old SUM-of-nulls aggregate produced."""
    df = _vecs(spark, with_null=True)
    out = {
        (r["vec_id"], r["band_id"]): r["sig"]
        for r in hyperplane_signatures(df, 2, 4, planes="data")
        .select("vec_id", "band_id", "sig")
        .collect()
    }
    assert out[(N + 1, 0)] == 0 and out[(N + 1, 1)] == 0


def test_plane_id_validation_still_fails_loud(spark):
    df = _vecs(spark).filter(F.col("vec_id") > 3)  # ids 4.. → missing planes
    with pytest.raises(ValueError, match="plane ids must cover"):
        hyperplane_signatures(df, 1, 8, planes="data")


def test_sized_stream_partitions_applies_policy_and_restores(spark):
    from anti_ddos_spark.session import (
        sized_stream_partitions,
        state_partitions_for,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with sized_stream_partitions(spark, 100):
        assert spark.conf.get(key) == str(state_partitions_for(100))
    assert spark.conf.get(key) == before
    with pytest.raises(RuntimeError):
        with sized_stream_partitions(spark, 10**6):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before  # restored on error too


def test_approx_key_count_sane(spark):
    from anti_ddos_spark.session import approx_key_count

    df = spark.range(1000).select((F.col("id") % 37).alias("k"), "id")
    n = approx_key_count(df, "k")
    assert 30 <= n <= 45  # approx_count_distinct of 37 keys
    n2 = approx_key_count(df, "k", "id")  # composite key
    assert 900 <= n2 <= 1100


def test_neardup_verify_spread_gated_on_local_scan(spark, tmp_path):
    """Small local parquet input → the candidate respread exchange is in
    the plan; an in-memory (non-scan) input → it is not."""
    from anti_ddos_spark.operators.similarity import lsh_neardup_pairs

    df = _vecs(spark)
    path = str(tmp_path / "vecs.parquet")
    df.write.parquet(path)
    scan = spark.read.parquet(path)

    def n_roundrobin(frame):
        import re

        # keyless repartition prints as "Repartition <n>, true" in the
        # optimized logical plan (RoundRobinPartitioning is physical)
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        return len(re.findall(r"Repartition \d+, true", plan))

    spread = lsh_neardup_pairs(scan, 0.0, 2, 4, planes="data")
    unspread = lsh_neardup_pairs(df, 0.0, 2, 4, planes="data")
    assert n_roundrobin(spread) >= 1
    assert n_roundrobin(unspread) == 0
    # and the spread must not change the result set
    a = sorted(map(tuple, spread.collect()))
    b = sorted(map(tuple, unspread.collect()))
    assert a == b
