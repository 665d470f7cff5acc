"""Recall quality of the production-parameter LSH operators.

The oracle queries prove the *mechanics* hash-match an independent
engine; these tests prove the production parameters actually retrieve —
multi-probe ANN recovers planted near-neighbours that brute force ranks
on top, and the banding s-curve sits at the documented threshold.
"""

from __future__ import annotations

import numpy as np
import pytest

from anti_ddos_spark.config import (
    LSH_BANDS,
    LSH_PLANES,
    MINHASH_K,
    lsh_threshold,
)
from anti_ddos_spark.operators.similarity import (
    _probe_masks,
    brute_force_topk,
    lsh_ann_topk,
)

K = 4  # = planted neighbours per cluster: brute-force top-K is exactly them
N_CLUSTERS = 10
PER_CLUSTER = 5  # 1 base + 4 planted near-neighbours (cos ≈ 0.9996)
DIM = 32


def _planted_df(spark):
    rng = np.random.default_rng(42)
    rows = []
    for c in range(N_CLUSTERS):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for m in range(PER_CLUSTER):
            v = base if m == 0 else base + 0.005 * rng.normal(size=DIM)
            rows.append((c * PER_CLUSTER + m, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_multiprobe_ann_recall_vs_brute_force(spark):
    """ANN at production planes (16) with multi-probe radius 2 must
    recover ≥80% of the brute-force top-k for a query whose true top-k
    are planted near-neighbours (cos ≈ 0.9996 → per-plane disagreement
    ≈ 1.7%, so Hamming ≤ 2 captures ≈ 99.9% per neighbour)."""
    df = _planted_df(spark)
    want = {r.vec_id for r in brute_force_topk(df, 0, K).collect()}
    got = {
        r.vec_id
        for r in lsh_ann_topk(
            df, 0, k=K, n_planes=LSH_PLANES, probe_hamming=2
        ).collect()
    }
    recall = len(want & got) / K
    assert recall >= 0.8, (recall, want, got)


def test_multiprobe_beats_single_bucket(spark):
    """Multi-probe must retrieve at least as many true neighbours as the
    single-bucket probe — the recall-recovery claim itself."""
    df = _planted_df(spark)
    want = {r.vec_id for r in brute_force_topk(df, 0, K).collect()}
    single = {
        r.vec_id
        for r in lsh_ann_topk(df, 0, k=K, n_planes=LSH_PLANES, probe_hamming=0).collect()
    }
    multi = {
        r.vec_id
        for r in lsh_ann_topk(df, 0, k=K, n_planes=LSH_PLANES, probe_hamming=2).collect()
    }
    assert len(want & multi) >= len(want & single)


def test_probe_mask_count():
    # radius 1 at 16 planes = 1 + 16 probes; radius 2 adds C(16,2)
    assert len(_probe_masks(16, 0)) == 1
    assert len(_probe_masks(16, 1)) == 17
    assert len(_probe_masks(16, 2)) == 17 + 120
    assert len(set(_probe_masks(16, 2))) == 137  # all distinct


def test_production_banding_threshold():
    # K=128, b=16 → r=8 → (1/16)^(1/8) ≈ 0.707: the near-dup operating
    # point from the dedup literature; guards against accidental
    # re-toy-ing of the constants.
    thr = lsh_threshold(MINHASH_K, LSH_BANDS)
    assert 0.65 <= thr <= 0.75, thr
    assert MINHASH_K >= 64 and LSH_BANDS >= 8


def test_gaussian_planes_ann_recall(spark):
    """Production plane set: seeded Gaussian hyperplanes (independent
    directions) must retrieve planted near-neighbours as well as the
    data-row planes — and they are immune to the correlated-plane bucket
    skew data rows exhibit on real corpora (VERDICT r2 #4)."""
    from anti_ddos_spark.operators.similarity import gaussian_planes

    df = _planted_df(spark)
    planes = gaussian_planes(spark, LSH_PLANES, DIM, seed=7)
    want = {r.vec_id for r in brute_force_topk(df, 0, K).collect()}
    got = {
        r.vec_id
        for r in lsh_ann_topk(
            df, 0, k=K, n_planes=LSH_PLANES, probe_hamming=2, planes=planes
        ).collect()
    }
    recall = len(want & got) / K
    assert recall >= 0.8, (recall, want, got)


def test_signature_build_rejects_missing_planes(spark):
    """ADVICE r2: a sparse/offset id space must fail loud, not silently
    shrink every signature."""
    import pytest as _pytest

    from anti_ddos_spark.operators.similarity import hyperplane_signatures

    df = _planted_df(spark).filter("vec_id >= 3")  # ids 1..2 missing
    with _pytest.raises(ValueError, match="hyperplanes"):
        # "data" mode is the one that derives planes from row ids — the
        # quality default (gaussian) has no id-coverage precondition.
        hyperplane_signatures(df, 1, LSH_PLANES, planes="data")
