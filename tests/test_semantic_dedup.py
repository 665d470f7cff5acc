"""semantic_dedup_flags (SemDeDup-style): planted-cluster behavior.

q51 (full_registry) proves cross-engine parity of the data-centroid
oracle mode; these prove the dedup DECISION on planted fixtures and that
the learned-centroid quality default executes end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from anti_ddos_spark.operators.similarity import semantic_dedup_flags

DIM = 16
N_CLUSTERS = 3
PER_CLUSTER = 4


def _planted(spark):
    """3 tight clusters (cos ≈ 0.9996 within) + 1 far singleton; ids
    assigned so min-id-per-cluster is known: cluster c owns ids
    c*PER_CLUSTER .. c*PER_CLUSTER+3, singleton is the last id."""
    rng = np.random.default_rng(11)
    bases = []
    while len(bases) < N_CLUSTERS:
        v = rng.normal(size=DIM)
        v /= np.linalg.norm(v)
        if all(abs(float(v @ b)) < 0.5 for b in bases):
            bases.append(v)
    rows = []
    for c, base in enumerate(bases):
        for m in range(PER_CLUSTER):
            v = base if m == 0 else base + 0.005 * rng.normal(size=DIM)
            rows.append((c * PER_CLUSTER + m, [float(x) for x in v]))
    lone = rng.normal(size=DIM)
    for b in bases:  # push the singleton away from every cluster
        lone -= (lone @ b) * b
    lone /= np.linalg.norm(lone)
    rows.append((N_CLUSTERS * PER_CLUSTER, [float(x) for x in lone]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>"), bases


def test_literal_centroids_keep_min_id_per_cluster(spark):
    df, bases = _planted(spark)
    flags = semantic_dedup_flags(
        df, n_centroids=N_CLUSTERS, tau=0.95,
        centroids=[[float(x) for x in b] for b in bases],
    ).collect()
    kept = {r["vec_id"] for r in flags if r["kept"] == 1}
    # exactly the min id of each planted cluster + the singleton survive
    want = {c * PER_CLUSTER for c in range(N_CLUSTERS)} | {N_CLUSTERS * PER_CLUSTER}
    assert kept == want, kept


def test_learned_default_executes_and_dedups(spark):
    """centroids=None → k-means under QUALITY_DEFAULTS; on the planted
    fixture learned cells must separate the clusters well enough that
    each loses its near-duplicates."""
    df, _bases = _planted(spark)
    flags = semantic_dedup_flags(df, n_centroids=N_CLUSTERS, tau=0.95).collect()
    kept = sum(r["kept"] for r in flags)
    assert kept == N_CLUSTERS + 1, [
        (r["vec_id"], r["centroid_id"], r["kept"]) for r in sorted(flags, key=lambda r: r["vec_id"])
    ]


def test_tau_one_keeps_everything_except_exact_dups(spark):
    df, _ = _planted(spark)
    flags = semantic_dedup_flags(df, n_centroids=N_CLUSTERS, tau=1.0, centroids="data").collect()
    # perturbed vectors are not exact dups → everything kept
    assert all(r["kept"] == 1 for r in flags)


# --- materialized-assignment form (round 5, VERDICT r4 #3) ----------------

SF = "/root/testdata/sf0.001"
TAU = 0.2  # the q51 oracle bar — low enough to produce real dups here


def _flag_set(rows):
    return {(r["vec_id"], r["centroid_id"], r["kept"]) for r in rows}


def test_indexed_flags_match_in_memory(spark, tmp_path):
    """semantic_dedup_flags_indexed over an ivf_build_index write must
    produce exactly the in-memory flags (same cells, same tau)."""
    from anti_ddos_spark.operators.similarity import (
        ivf_build_index,
        semantic_dedup_flags_indexed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "sem_idx")
    ivf_build_index(emb, path, n_centroids=8, centroids="data")

    got = _flag_set(
        semantic_dedup_flags_indexed(spark, path, tau=TAU).collect()
    )
    want = _flag_set(
        semantic_dedup_flags(
            emb, n_centroids=8, tau=TAU, centroids="data"
        ).collect()
    )
    assert got == want
    assert any(k == 0 for _, _, k in want), "fixture produced no dups — tau too high"


def test_indexed_cell_restriction_prunes_partitions(spark, tmp_path):
    """The per-cell-group sweep the docstring promises: a cells=[...]
    run must (a) match the full result filtered to those cells and
    (b) read the index via PARTITION pruning on centroid_id, with no
    assignment recompute (no Window / cross join) anywhere in the plan."""
    from anti_ddos_spark.operators.similarity import (
        ivf_build_index,
        semantic_dedup_flags_indexed,
    )
    from anti_ddos_spark.plans import plan_summary

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "sem_idx2")
    # single-posting layout pinned: cells=[...] over it is the plain
    # union-by-append sweep (each id entirely inside its one cell); the
    # duplicated-postings layout shards via the federated protocol
    # instead (test_sharded_indexed_nprobe_matches_full)
    ivf_build_index(
        emb, path, n_centroids=8, centroids="data", membership_nprobe=1
    )

    cells = [2, 5]
    sub = semantic_dedup_flags_indexed(spark, path, tau=TAU, cells=cells)
    got = _flag_set(sub.collect())
    full = semantic_dedup_flags_indexed(spark, path, tau=TAU).collect()
    want = _flag_set(r for r in full if r["centroid_id"] in cells)
    assert got == want

    plan = plan_summary(sub)["text"]
    assert "PartitionFilters: [" in plan
    for seg in plan.split("PartitionFilters: [")[1:]:
        head = seg.split("]", 1)[0]
        assert "centroid_id" in head, head  # every index scan is pruned
    # neither join side recomputes the assignment subtree
    assert "Window" not in plan, "assignment argmax recomputed"
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_nprobe_catches_the_cell_boundary_pair(spark):
    """Round 8 (s-curve finding): single-cell bounding misses near-dup
    pairs split by a cell boundary — the measured ~0.74 recall ceiling
    at s=0.95. nprobe=2 candidates each vector in its two nearest
    cells, so a straddling pair meets in the runner-up cell. Crafted
    boundary pair: orthogonal data-mode centroids, two vectors at
    cos≈0.9996 to each other but assigned to DIFFERENT primary cells."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid seed cell 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid seed cell 1
        (2, [0.72, 0.70, 0.0, 0.0]),  # leans cell 0
        (3, [0.70, 0.72, 0.0, 0.0]),  # leans cell 1 — the straddler
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    f1 = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_flags(
            df, n_centroids=2, tau=0.99, centroids="data", nprobe=1
        ).collect()
    }
    # split across cells: the near-dup pair never meets at nprobe=1
    assert f1[2][1] != f1[3][1]
    assert f1[2][0] == 1 and f1[3][0] == 1  # both kept — the miss

    f2 = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_flags(
            df, n_centroids=2, tau=0.99, centroids="data", nprobe=2
        ).collect()
    }
    # primary assignment unchanged (output cells identical) ...
    assert {k: v[1] for k, v in f2.items()} == {
        k: v[1] for k, v in f1.items()
    }
    # ... but the straddling pair now meets: larger id dropped
    assert f2[2][0] == 1 and f2[3][0] == 0
    # dropped set grows monotonically with nprobe
    assert all(f2[k][0] <= f1[k][0] for k in f1)


def test_bare_nprobe_default_resolves_by_quality_flag(spark, monkeypatch):
    """Round 9: a bare call ships the measured-better nprobe=2 under
    QUALITY_DEFAULTS (the r4 Gaussian-planes pattern); with the flag
    off it is byte-identical to the single-cell original. Oracle
    queries (q51) pin nprobe=1 explicitly, so their hashes never
    depended on the flag."""
    from anti_ddos_spark import config

    df, _bases = _planted(spark)

    def run(**kw):
        return sorted(
            (r["vec_id"], r["centroid_id"], r["kept"])
            for r in semantic_dedup_flags(
                df, n_centroids=N_CLUSTERS, tau=0.9, centroids="data", **kw
            ).collect()
        )

    assert config.QUALITY_DEFAULTS  # env default
    assert run() == run(nprobe=2)
    monkeypatch.setattr(config, "QUALITY_DEFAULTS", False)
    assert run() == run(nprobe=1)


def test_indexed_nprobe_matches_in_memory(spark, tmp_path):
    """Duplicated-postings index (membership_nprobe=2): flags equal the
    in-memory nprobe=2 form, including the boundary pair that the
    single-posting index misses; the boundary vector is PHYSICALLY
    present in its runner-up cell partition."""
    import os

    from anti_ddos_spark.operators.similarity import (
        ivf_build_index,
        semantic_dedup_flags_indexed,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.72, 0.70, 0.0, 0.0]),
        (3, [0.70, 0.72, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf2")
    ivf_build_index(
        df, path, n_centroids=2, centroids="data", membership_nprobe=2
    )
    # the straddler's posting exists in BOTH cell partitions
    parts = {
        d for d in os.listdir(path) if d.startswith("centroid_id=")
    }
    assert parts == {"centroid_id=0", "centroid_id=1"}
    got = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_flags_indexed(
            spark, path, tau=0.99
        ).collect()
    }
    want = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_flags(
            df, n_centroids=2, tau=0.99, centroids="data", nprobe=2
        ).collect()
    }
    assert got == want
    assert got[3][0] == 0  # the boundary dup IS caught
    # one output row per vector (primary posting only)
    assert sorted(got) == [0, 1, 2, 3]


def test_sharded_indexed_nprobe_matches_full(spark, tmp_path):
    """Round 9 (ADVICE): with duplicated postings, a pair's ONLY shared
    probed cell can sit in a shard owning neither id's primary cell —
    the shard that discovers the drop cannot emit the id's output row,
    so a plain union of owned rows loses the flag. The federated
    protocol (owned rows + drop-evidence rows, folded by
    semantic_dedup_merge_shards) must equal the unsharded run.

    Geometry: data centroids e0,e1,e2; ids 3 and 4 are near-identical
    (cos≈0.999995) but primary in cells 0 and 1 respectively, and their
    only SHARED membership cell is 2 — owned by a third shard."""
    from anti_ddos_spark.operators.similarity import (
        ivf_build_index,
        semantic_dedup_flags_indexed,
        semantic_dedup_merge_shards,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.578, 0.576, 0.5770, 0.0]),  # cells {0,2}, primary 0
        (4, [0.576, 0.578, 0.5769, 0.0]),  # cells {1,2}, primary 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_shard")
    ivf_build_index(
        df, path, n_centroids=3, centroids="data", membership_nprobe=2
    )

    full = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_flags_indexed(spark, path, tau=0.99).collect()
    }
    assert full[4][0] == 0 and full[3][0] == 1  # the cross-cell dup IS caught

    shards = [
        semantic_dedup_flags_indexed(spark, path, tau=0.99, cells=[c])
        for c in (0, 1, 2)
    ]
    union = shards[0].unionByName(shards[1]).unionByName(shards[2])

    # the old union-of-owned-rows contract WAS the bug: id 4's owned row
    # (shard 1, where its dup partner has no posting) says kept=1
    owned_only = {
        r["vec_id"]: r["kept"]
        for r in union.filter("centroid_id is not null").collect()
    }
    assert owned_only[4] == 1

    # shard 2 discovers the drop it cannot own and emits it as evidence
    ev = union.filter("centroid_id is null").collect()
    assert [(r["vec_id"], r["kept"]) for r in ev] == [(4, 0)]

    merged = {
        r["vec_id"]: (r["kept"], r["centroid_id"])
        for r in semantic_dedup_merge_shards(union).collect()
    }
    assert merged == full
