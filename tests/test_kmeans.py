"""kmeans_train convergence: the weaker-check contract for the one
iterative operator (q46 is registered rows-only, so these tests carry
its correctness burden).
"""

from __future__ import annotations

import numpy as np

from anti_ddos_spark.operators.similarity import kmeans_train

K = 4
PER = 25
DIM = 8
SEP = 10.0  # cluster centers 10 apart, noise 0.1 → unambiguous


def _planted(spark):
    rng = np.random.default_rng(11)
    centers = rng.normal(scale=SEP, size=(K, DIM))
    rows = []
    for c in range(K):
        for m in range(PER):
            v = centers[c] + 0.1 * rng.normal(size=DIM)
            rows.append((c * PER + m, [float(x) for x in v]))
    return centers, spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )


def test_inertia_monotone_nonincreasing(spark):
    _, df = _planted(spark)
    _, hist = kmeans_train(df, k=K, iters=5)
    assert len(hist) == 5
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9, hist


def test_recovers_planted_centers(spark):
    centers, df = _planted(spark)
    cents, hist = kmeans_train(df, k=K, iters=5)
    # every learned centroid sits within noise distance of a distinct
    # planted center (greedy matching is fine at 10-sigma separation)
    got = np.array(cents)
    used = set()
    for c in centers:
        d = np.linalg.norm(got - c, axis=1)
        j = int(np.argmin(d))
        assert d[j] < 1.0, (d[j], c)
        assert j not in used
        used.add(j)
    # converged: final inertia ≈ noise floor (PER*K points × 0.1² × DIM)
    assert hist[-1] < K * PER * (0.1**2) * DIM * 3


def test_deterministic_across_runs(spark):
    _, df = _planted(spark)
    a, ha = kmeans_train(df, k=K, iters=3)
    b, hb = kmeans_train(df, k=K, iters=3)
    assert a == b and ha == hb
