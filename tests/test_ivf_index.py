"""Materialized IVF index: partition pruning + result parity.

The scale claim made checkable: after ivf_build_index writes the corpus
partitioned by centroid_id, a probe query's scan must show the cell
predicate as a PARTITION filter (files for unprobed cells never open),
and its results must equal the join-based ivf_topk on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anti_ddos_spark.operators.similarity import (
    as_double,
    ivf_build_index,
    ivf_search_index,
    ivf_topk,
)

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_index_search_matches_ivf_topk(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf_idx")
    # membership_nprobe=1 pinned: this test proves the CLASSIC
    # single-posting layout is search-equivalent to the join-based
    # ivf_topk (whose corpus side is primary-assignment only); the
    # round-9 quality default (2) adds runner-up postings the join
    # form deliberately doesn't see.
    ivf_build_index(
        emb, path, n_centroids=8, centroids="data", membership_nprobe=1
    )

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 17).first()["embedding"]]
    got = ivf_search_index(spark, path, qvec, k=10, nprobe=3)
    got_rows = [(r["vec_id"], round(r["cos"], 6)) for r in got.collect()]

    want = ivf_topk(emb, 17, k=11, n_centroids=8, nprobe=3)
    want_rows = [(r["vec_id"], round(r["cos"], 6)) for r in want.collect()]
    # ivf_topk excludes the query row; the index search keeps it (cos=1
    # rank 1 by construction) — align by dropping it from the index result
    got_rows = [r for r in got_rows if r[0] != 17]
    assert got_rows == want_rows[: len(got_rows)]


def test_probe_is_partition_filter(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf_idx2")
    ivf_build_index(emb, path, n_centroids=8, centroids="data")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 17).first()["embedding"]]
    from anti_ddos_spark.plans import plan_summary

    plan = plan_summary(
        ivf_search_index(spark, path, qvec, k=10, nprobe=2)
    )["text"]
    # the cell predicate must prune partitions at the scan, not filter rows
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "centroid_id" in seg, seg

def test_incremental_append_matches_full_rebuild(spark, tmp_path):
    """ivf_append_index(new batch) must be search-equivalent to a full
    rebuild over base+batch: same sidecar centroids → same max-cosine
    assignment → same cells, just in newer files. Partition pruning must
    survive the append."""
    emb = _emb(spark)
    # keep the centroid rows (vec_id < 8) in base so both indexes are
    # built around the SAME cells; the delta is a later-arriving batch
    base = emb.filter((F.col("vec_id") < 8) | (F.col("vec_id") % 5 != 0))
    delta = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 5 == 0))

    from anti_ddos_spark.operators.similarity import ivf_append_index

    inc = str(tmp_path / "ivf_inc")
    ivf_build_index(base, inc, n_centroids=8, centroids="data")
    ivf_append_index(delta, inc)

    full = str(tmp_path / "ivf_full")
    ivf_build_index(emb, full, n_centroids=8, centroids="data")

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 17).first()["embedding"]]
    got = [
        (r["vec_id"], round(r["cos"], 6))
        for r in ivf_search_index(spark, inc, qvec, k=10, nprobe=3).collect()
    ]
    want = [
        (r["vec_id"], round(r["cos"], 6))
        for r in ivf_search_index(spark, full, qvec, k=10, nprobe=3).collect()
    ]
    assert got == want

    from anti_ddos_spark.plans import plan_summary

    plan = plan_summary(ivf_search_index(spark, inc, qvec, k=10, nprobe=2))["text"]
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "centroid_id" in seg, seg


def test_kmeans_centers_build_recalls_planted_clusters(spark, tmp_path):
    """VERDICT r2 #4: wire kmeans_train centers into ivf_build_index and
    prove retrieval quality on a NON-orthogonal fixture — leading-vector
    cells are plumbing, learned cells are the index you'd ship. Recall
    of brute-force top-k must be ≥ 0.9 at nprobe=3 of 6 cells."""
    import numpy as np

    from anti_ddos_spark.operators.similarity import (
        brute_force_topk,
        kmeans_train,
    )

    rng = np.random.default_rng(23)
    n_clusters, per, dim = 6, 30, 16
    rows = []
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    for c in range(n_clusters):
        for m in range(per):
            v = centers[c] + 0.08 * rng.normal(size=dim)
            v /= np.linalg.norm(v)
            rows.append((c * per + m, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    cents, _ = kmeans_train(df, k=n_clusters, iters=5)
    path = str(tmp_path / "ivf_kmeans")
    ivf_build_index(df, path, centroids=cents)

    hits = total = 0
    for qid in (0, 40, 95, 150):
        qvec = [
            float(x) for x in df.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        want = {r["vec_id"] for r in brute_force_topk(df, qid, k=10).collect()}
        got = {
            r["vec_id"]
            for r in ivf_search_index(spark, path, qvec, k=11, nprobe=3).collect()
            if r["vec_id"] != qid
        }
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.9, (hits, total)


def test_append_to_duplicated_postings_index_keeps_layout(spark, tmp_path):
    """Appending to a membership_nprobe=2 index must write MATCHING
    duplicated postings (detected via the _layout.json marker): the new
    vectors appear on the primary side of the indexed dedup and a new
    boundary straddler lands in both cells — without the layout match,
    appended rows carry a null is_primary and silently vanish."""
    from anti_ddos_spark.operators.similarity import (
        ivf_append_index,
        ivf_build_index,
        semantic_dedup_flags_indexed,
    )

    base = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.72, 0.70, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf_np2")
    ivf_build_index(
        base, path, n_centroids=2, centroids="data", membership_nprobe=2
    )
    # append the straddler AFTER the build
    ivf_append_index(
        spark.createDataFrame(
            [(3, [0.70, 0.72, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        ),
        path,
    )
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup_flags_indexed(spark, path, tau=0.99).collect()
    }
    # every vector (incl. the appended one) has a primary-side row...
    assert sorted(got) == [0, 1, 2, 3]
    # ...and the appended straddler is caught by the cross-cell pair
    assert got[3] == 0 and got[2] == 1


def test_search_over_duplicated_postings_dedups_ids(spark, tmp_path):
    """Round 9 (ADVICE): searching a membership_nprobe=2 index with
    nprobe>=2 probes cells that each hold a posting for the same
    boundary vector — without an id collapse before the top-k, that
    vector occupies several of the k slots and effective k shrinks.
    The search must return DISTINCT ids and match brute force."""
    import numpy as np

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.72, 0.70, 0.0, 0.0]),   # straddler: postings in 0 AND 1
        (3, [0.70, 0.72, 0.0, 0.0]),   # straddler: postings in 1 AND 0
        (4, [0.95, 0.10, 0.0, 0.0]),
        (5, [0.10, 0.95, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_np2_search")
    ivf_build_index(
        df, path, n_centroids=2, centroids="data", membership_nprobe=2
    )
    qvec = [0.71, 0.71, 0.0, 0.0]
    got = [
        (r["vec_id"], round(r["cos"], 6))
        for r in ivf_search_index(spark, path, qvec, k=4, nprobe=2).collect()
    ]
    ids = [i for i, _ in got]
    # k distinct ids — the duplicated postings must collapse
    assert len(ids) == len(set(ids)) == 4, got
    q = np.array(qvec)
    want = sorted(
        (
            (i, round(float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 6))
            for i, v in ((i, np.array(v)) for i, v in rows)
        ),
        key=lambda t: (-t[1], t[0]),
    )[:4]
    assert got == want
