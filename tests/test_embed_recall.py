"""Graded embedding-LSH recall vs theory (round 8, r7 verdict task #4).

The MinHash family's s-curve was measured in round 7; this gives the
embedding family the same treatment. The fixture plants pairs at EXACT
cosines (b = s·â + √(1-s²)·ŵ⊥), so detection per grade can be compared
against Charikar's sign-bit collision theory (P[plane agrees] = 1-θ/π)
without estimating ground truth — the pairs ARE the ground truth.

Statistical bounds: per-grade pair count n ≈ vectors/20/6; measured
detection is Binomial(n, theory), so the assertions allow 4σ + the
fixture's float32 slack. A systematic implementation error (wrong band
layout, biased planes, mis-normalized vectors) shifts detection far
outside these bands — that is what this test exists to catch.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

N_VECTORS = 12_000  # 100 pairs per grade


@pytest.fixture(scope="module")
def scurve_rows(spark, tmp_path_factory):
    import embed_scurve
    import scale_probe

    out = str(tmp_path_factory.mktemp("graded_emb"))
    scale_probe.build_graded_embeddings(spark, out, n_vectors=N_VECTORS)
    emb = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    return embed_scurve.measure_scurve(spark, emb)


def _sigma(p: float, n: int) -> float:
    return math.sqrt(max(p * (1 - p), 1e-9) / n)


def test_fixture_plants_all_grades(scurve_rows):
    grades = [r["target_cos"] for r in scurve_rows]
    assert grades == sorted(grades) and len(grades) == 6
    assert all(r["pairs"] >= 60 for r in scurve_rows)


def test_banded_detection_tracks_charikar_theory(scurve_rows):
    """8 bands × 8 Gaussian planes: measured candidate-generation rate
    per grade within 4σ of 1-(1-p^8)^8 — the whole curve, not just the
    s≈1 corner planted-cluster units exercise."""
    for r in scurve_rows:
        th, n = r["banded_theory"], r["pairs"]
        assert abs(r["banded_detect"] - th) <= 4 * _sigma(th, n) + 0.02, r


def test_multiprobe_detection_tracks_theory(scurve_rows):
    """q44's production shape (16 planes, Hamming ≤ 1): measured
    within-radius rate per grade within 4σ of Σ_{d≤1} C(16,d) p^(16-d)(1-p)^d."""
    for r in scurve_rows:
        th, n = r["probe_theory"], r["pairs"]
        assert abs(r["probe_detect"] - th) <= 4 * _sigma(th, n) + 0.02, r


def test_recall_is_monotone_and_high_grade_pairs_are_found(scurve_rows):
    by = {r["target_cos"]: r for r in scurve_rows}
    # near-dup grades must be found reliably by the banded form
    assert by[0.99]["banded_detect"] >= 0.95
    assert by[0.95]["banded_detect"] >= 0.85
    # and the curve is a curve: high grade ≫ low grade on every mechanism
    assert by[0.99]["banded_detect"] >= by[0.50]["banded_detect"] + 0.3
    assert by[0.99]["probe_detect"] >= by[0.50]["probe_detect"] + 0.3


def test_semdedup_cell_recall_ceiling(scurve_rows):
    """The q51 family's candidate bound: same-cell rate is the recall
    ceiling — and it is a real CEILING, not ~1 (the probe's round-8
    finding: at 16 cells over 20k vectors, s=0.95 pairs co-locate only
    ~0.74 of the time; more cells cut cost AND recall — the SemDeDup
    recall/cost trade measured, PERF.md round 8). Near-identical pairs
    must still co-locate reliably, and distant pairs far less — the
    clustering bounds the candidate space without degenerating."""
    by = {r["target_cos"]: r for r in scurve_rows}
    assert by[0.99]["same_cell"] >= 0.8
    assert by[0.95]["same_cell"] >= 0.6
    assert by[0.50]["same_cell"] <= by[0.99]["same_cell"] - 0.25
    # nprobe=2 recovery (the shipped fix): strictly dominates the
    # single-cell ceiling and lifts τ-eligible recall to ~0.95+
    for r in scurve_rows:
        assert r["same_cell_nprobe2"] >= r["same_cell"]
    assert by[0.95]["same_cell_nprobe2"] >= 0.85
    assert by[0.99]["same_cell_nprobe2"] >= 0.9


def test_q137_recall_contract_holds_in_band(spark):
    """q137 moves the recall measurement into a driver-hashable row: per
    planted grade, measured IVF-multiprobe recall must sit at or above
    its contracted floor, with the floors set under the weakest reading
    across sf0.001/0.01/0.1 (module literal). Every grade plants the
    same pair count (corpus/4/5) and the booleans must all be 1 — this
    is the contract the driver hash will pin once the row rotates in."""
    from anti_ddos_spark.queries.similarity import (
        GRADE_BETAS,
        GRADE_FLOORS,
        q137_ann_recall_contract,
    )

    rows = q137_ann_recall_contract(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == len(GRADE_BETAS) == len(GRADE_FLOORS)
    by = {r["grade_id"]: r for r in rows}
    n0 = by[0]["n_pairs"]
    for g in range(len(GRADE_BETAS)):
        assert by[g]["n_pairs"] == n0 > 0
        assert by[g]["floor_pct"] == GRADE_FLOORS[g]
        assert by[g]["meets_floor"] == 1, (g, by[g])
    # the curve is a curve: the near-identical grade dominates the
    # cross-cell grade by a wide margin
    assert by[0]["recall_pct"] >= by[4]["recall_pct"] + 20
