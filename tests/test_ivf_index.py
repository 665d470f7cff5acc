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


def test_apply_changes_matches_full_rebuild_and_bounds_rewrite(
    spark, tmp_path
):
    """CDC maintenance of the index: one retraction-form batch (inserts,
    updates that MOVE cells, deletes) applied via ivf_apply_changes must
    leave the index content-identical to a full rebuild from the
    post-change corpus against the same sidecar centroids — and must
    rewrite ONLY the touched cells (untouched cells keep their files)."""
    import os

    from anti_ddos_spark.operators.similarity import ivf_apply_changes

    emb = _emb(spark).select("vec_id", "embedding")
    path = str(tmp_path / "ivf_cdc")
    ivf_build_index(
        emb, path, n_centroids=8, centroids="data", membership_nprobe=1
    )
    cents = [
        [float(x) for x in r["cvec_d"]]
        for r in spark.read.parquet(path + "_centroids")
        .orderBy("cid")
        .collect()
    ]

    def cell_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("centroid_id="):
                out[d] = sorted(
                    f for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")
                )
        return out

    before = cell_files()

    # a small batch (the realistic delta shape): 2 deletes, 2 updates
    # that take a NEIGHBORING row's vector (usually a different cell),
    # 2 inserts — few enough vector-cell touches that most of the 8
    # cells stay untouched
    dele = emb.filter(F.col("vec_id").isin([30, 199]))
    upd_old = emb.filter(F.col("vec_id").isin([55, 310]))
    nxt = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("new_emb"),
    )
    upd_new = upd_old.join(nxt, "vec_id").select(
        "vec_id", F.col("new_emb").alias("embedding")
    )
    maxid = emb.agg(F.max("vec_id")).collect()[0][0]
    ins = (
        emb.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") <= 101)
        ).select(
            (F.col("vec_id") + maxid + 1 - 100).alias("vec_id"),
            "embedding",
        )
    )
    changes = (
        dele.withColumn("_op", F.lit("D"))
        .unionByName(upd_old.withColumn("_op", F.lit("U-")))
        .unionByName(upd_new.withColumn("_op", F.lit("U+")))
        .unionByName(ins.withColumn("_op", F.lit("I")))
    )
    touched = ivf_apply_changes(changes, path)
    assert touched and len(touched) <= 8

    after = cell_files()
    untouched = set(before) - {f"centroid_id={c}" for c in touched}
    assert untouched, "fixture should leave some cells untouched"
    for d in untouched:
        assert after[d] == before[d], f"untouched cell {d} was rewritten"

    # post-change corpus → full rebuild against the SAME centroids
    upd_ids = [r[0] for r in upd_old.select("vec_id").collect()]
    del_ids = [r[0] for r in dele.select("vec_id").collect()]
    corpus = (
        emb.filter(~F.col("vec_id").isin(del_ids + upd_ids))
        .unionByName(upd_new)
        .unionByName(ins)
    )
    full = str(tmp_path / "ivf_cdc_full")
    ivf_build_index(
        corpus, full, n_centroids=8, centroids=cents, membership_nprobe=1
    )

    def content(p):
        return sorted(
            (
                r["vec_id"],
                int(r["centroid_id"]),
                tuple(round(float(x), 6) for x in r["embedding"]),
            )
            for r in spark.read.parquet(p).collect()
        )

    assert content(path) == content(full)


def test_apply_changes_maintains_duplicated_postings_and_empty_cells(
    spark, tmp_path
):
    """The duplicated-postings layout (membership_nprobe=2) is
    maintained with matching rank-≤2 postings on both remove and add
    sides; a batch that deletes every vector of a cell drops the cell's
    directory (dynamic overwrite alone would leave stale files)."""
    import os

    from anti_ddos_spark.operators.similarity import ivf_apply_changes

    # 3 orthogonal-ish cells, 4 vectors each, all unit-norm
    base = []
    for c in range(3):
        for m in range(4):
            v = [0.0] * 6
            v[c] = 1.0
            v[3 + ((c + m) % 3)] = 0.3
            n = sum(x * x for x in v) ** 0.5
            base.append((c * 4 + m, [x / n for x in v]))
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_np2")
    ivf_build_index(
        df,
        path,
        n_centroids=3,
        centroids=[r[1] for r in base[::4]],
        membership_nprobe=2,
    )
    # delete ALL of cell 2's primaries (ids 8..11) and update id 0's
    # vector to live near cell 1
    dele = df.filter(F.col("vec_id") >= 8)
    new0 = spark.createDataFrame(
        [(0, [r for r in base[4][1]])], "vec_id long, embedding array<double>"
    )
    changes = (
        dele.withColumn("_op", F.lit("D"))
        .unionByName(
            df.filter(F.col("vec_id") == 0).withColumn("_op", F.lit("U-"))
        )
        .unionByName(new0.withColumn("_op", F.lit("U+")))
    )
    ivf_apply_changes(changes, path)

    corpus = df.filter(
        (F.col("vec_id") < 8) & (F.col("vec_id") != 0)
    ).unionByName(new0)
    full = str(tmp_path / "ivf_np2_full")
    ivf_build_index(
        full_corpus := corpus,
        full,
        n_centroids=3,
        centroids=[r[1] for r in base[::4]],
        membership_nprobe=2,
    )

    def content(p):
        return sorted(
            (
                r["vec_id"],
                int(r["centroid_id"]),
                bool(r["is_primary"]),
                tuple(round(float(x), 6) for x in r["embedding"]),
            )
            for r in spark.read.parquet(p).collect()
        )

    assert content(path) == content(full)
    # cells emptied by the batch hold no stale directories: the live
    # cell dirs are exactly the rebuild's
    live = {d for d in os.listdir(path) if d.startswith("centroid_id=")}
    want = {d for d in os.listdir(full) if d.startswith("centroid_id=")}
    assert live == want


def test_change_feed_drives_index_maintenance_end_to_end(spark, tmp_path):
    """The full consumer loop: embeddings live in a CDC versioned table;
    a change batch lands through the REAL committer; the table's change
    feed (REAL versioned_cdf stream, update_preimage=true) drives
    ivf_apply_changes; the maintained index equals a rebuild from the
    table's LIVE snapshot. This is the production shape — a vector
    index that follows its source-of-truth table without rescans."""
    from anti_ddos_spark.operators.similarity import ivf_apply_changes
    from anti_ddos_spark.sources.cdf import register_cdf_source
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        streaming_cdc_committer,
    )

    emb = _emb(spark).select("vec_id", "embedding").filter(
        F.col("vec_id") < 200
    )
    root = str(tmp_path / "embtbl")
    tbl = VersionedTable(root)
    sink = streaming_cdc_committer(tbl, "vec_id", n_buckets=16)
    sink(emb.withColumn("op", F.lit("I")), 0)
    v0 = tbl.current_version()

    path = str(tmp_path / "ivf_feed")
    ivf_build_index(
        tbl.read(spark), path, n_centroids=8, centroids="data",
        membership_nprobe=1,
    )
    cents = [
        [float(x) for x in r["cvec_d"]]
        for r in spark.read.parquet(path + "_centroids")
        .orderBy("cid")
        .collect()
    ]

    # the change batch: delete 30, move 55 onto 54's vector, insert 500
    nxt = emb.filter(F.col("vec_id") == 54).select(
        F.lit(55).alias("vec_id"), "embedding"
    )
    ins = emb.filter(F.col("vec_id") == 100).select(
        F.lit(500).alias("vec_id"), "embedding"
    )
    b2 = (
        emb.filter(F.col("vec_id") == 30)
        .withColumn("op", F.lit("D"))
        .unionByName(nxt.withColumn("op", F.lit("U")))
        .unionByName(ins.withColumn("op", F.lit("I")))
    )
    sink(b2, 1)

    register_cdf_source(spark)
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "vec_id")
        .option("start_version", v0)
        .option("update_preimage", "true")
        .load()
        .writeStream.format("memory")
        .queryName("emb_feed")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    changes = spark.table("emb_feed").drop("_version")
    assert {r["_op"] for r in changes.collect()} == {"D", "U-", "U+", "I"}
    touched = ivf_apply_changes(changes, path)
    assert touched

    full = str(tmp_path / "ivf_feed_full")
    ivf_build_index(
        tbl.read(spark), full, n_centroids=8, centroids=cents,
        membership_nprobe=1,
    )

    def content(p):
        return sorted(
            (
                r["vec_id"],
                int(r["centroid_id"]),
                tuple(round(float(x), 6) for x in r["embedding"]),
            )
            for r in spark.read.parquet(p).collect()
        )

    assert content(path) == content(full)
    spark.catalog.dropTempView("emb_feed")


def test_blas_assignment_is_byte_identical_to_expression(spark):
    """r10 verdict task #5: the BLAS-batch scoring path (shipped
    default after the 1M×256 probe measured 22× on the build with
    byte-identical output) must keep exact assignment parity with the
    zero-Python expression form — same cells, same is_primary ranks,
    same (cos desc, cid asc) tie-break — at both nprobe postures."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"),
        S.as_double(F.col("embedding")).alias("cvec"),
    )
    for nprobe in (1, 2):
        cols = ["vec_id", "centroid_id"] + (
            ["is_primary"] if nprobe > 1 else []
        )
        expr = S._assign_cells(
            emb, cents, nprobe, "vec_id", "embedding", scoring="expr"
        )
        blas = S._assign_cells(
            emb, cents, nprobe, "vec_id", "embedding", scoring="blas"
        )
        ra = sorted(tuple(r) for r in expr.select(cols).collect())
        rb = sorted(tuple(r) for r in blas.select(cols).collect())
        assert ra == rb
        assert [f.dataType for f in expr.select(cols).schema.fields] == [
            f.dataType for f in blas.select(cols).schema.fields
        ]


def test_blas_near_tie_break_and_empty_centroids(spark):
    """Round-12 verdict task #6 + ADVICE low. (a) Tie-break pin: two
    centroids at ulp-equal cosine to every probe — the (cos desc,
    cid asc) winner must be the LOWEST cid on BOTH scoring paths
    (numpy's first-max argmax / stable argsort vs Catalyst max_by over
    (cos, -cid)); this is the invariant that protects every downstream
    oracle hash from BLAS-build reduction-order variance. (b) An empty
    centroid set must degrade to zero assignments, not shape-error in
    np.stack/matmul."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators import similarity as S

    probes = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.6, 0.8, 0.0]), (3, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # cid 7 and cid 2 are IDENTICAL vectors (exact cosine tie); cid 5
    # is the same direction scaled (cosine is scale-invariant → a
    # three-way tie); cid 9 is orthogonal, never the winner
    tied = [
        (7, [2.0, 1.0, 0.0]),
        (2, [2.0, 1.0, 0.0]),
        (5, [4.0, 2.0, 0.0]),
        (9, [-1.0, 2.0, 0.0]),
    ]
    cents = spark.createDataFrame(tied, "cid long, cvec array<double>")
    for nprobe in (1, 2, 3):
        cols = ["vec_id", "centroid_id"] + (
            ["is_primary"] if nprobe > 1 else []
        )
        got = {}
        for scoring in ("expr", "blas"):
            out = S._assign_cells(
                probes, cents, nprobe, "vec_id", "embedding",
                scoring=scoring,
            )
            got[scoring] = sorted(tuple(r) for r in out.select(cols).collect())
        assert got["expr"] == got["blas"]
        # the tied family resolves in ascending-cid order: primary is
        # always cid 2, the second probe cell is cid 5
        prim = {
            r[0]: r[1]
            for r in got["blas"]
            if nprobe == 1 or r[2]  # is_primary
        }
        assert prim == {1: 2, 2: 2, 3: 2}
        if nprobe >= 2:
            # every probe's non-primary cells continue in ascending-cid
            # order through the tie: 5 next, then 7
            by_probe = {}
            for vec_id, cid, is_primary in got["blas"]:
                if not is_primary:
                    by_probe.setdefault(vec_id, []).append(cid)
            want = [5] if nprobe == 2 else [5, 7]
            assert by_probe == {1: want, 2: want, 3: want}

    empty = cents.limit(0)
    for scoring in ("expr", "blas"):
        out = S._assign_cells(
            probes, empty, 1, "vec_id", "embedding", scoring=scoring
        )
        assert out.count() == 0
        assert "centroid_id" in out.columns


def test_drift_monitor_trips_and_retrain_restores_recall(spark, tmp_path):
    """r11 verdict task #7: centroids go stale as the corpus drifts —
    postings maintenance can't fix that, and recall degrades silently.
    The monitor (one aggregate: per-cell occupancy + mean intra-cell
    cosine vs the build-time baseline) must trip on planted drift, and
    ivf_retrain (kmeans over the index's own postings, rebuild in
    place) must clear it and deliver contract-level recall over the
    drifted corpus."""
    import numpy as np

    from anti_ddos_spark.operators.similarity import (
        brute_force_topk,
        ivf_append_index,
        ivf_build_index,
        ivf_drift_report,
        ivf_retrain,
        ivf_search_index,
    )

    rng = np.random.default_rng(7)
    dim, per = 16, 40

    def make(centers, id0):
        rows = []
        for c, ctr in enumerate(centers):
            for m in range(per):
                v = ctr + 0.06 * rng.normal(size=dim)
                v /= np.linalg.norm(v)
                rows.append((id0 + c * per + m, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>"
        )

    base_centers = rng.normal(size=(4, dim))
    base_centers /= np.linalg.norm(base_centers, axis=1, keepdims=True)
    base = make(base_centers, 0)
    path = str(tmp_path / "ivf_drift")
    ivf_build_index(base, path, n_centroids=4, centroids="learned",
                    membership_nprobe=1)

    # fresh index agrees with its own baseline
    r0 = ivf_drift_report(spark, path)
    assert not r0["retrain_recommended"]
    assert abs(r0["cos_drop"]) < 1e-6

    # planted drift: four NEW clusters the build never saw
    new_centers = rng.normal(size=(4, dim))
    new_centers /= np.linalg.norm(new_centers, axis=1, keepdims=True)
    drifted = make(new_centers, 10_000)
    ivf_append_index(drifted, path)
    r1 = ivf_drift_report(spark, path)
    assert r1["retrain_recommended"], r1
    assert r1["cos_drop"] > 0.05  # new mass sits far from old centers

    before = r1["current"]["mean_intra_cosine"]
    ivf_retrain(spark, path)
    r2 = ivf_drift_report(spark, path)
    assert not r2["retrain_recommended"], r2
    assert r2["current"]["mean_intra_cosine"] > before

    # contract-level recall over the drifted corpus after retrain
    full = base.unionByName(drifted)
    hits = total = 0
    for qid in (0, 45, 10_000, 10_045, 10_125):
        qvec = [
            float(x)
            for x in full.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        want = {r["vec_id"] for r in brute_force_topk(full, qid, k=10).collect()}
        got = {
            r["vec_id"]
            for r in ivf_search_index(
                spark, path, qvec, k=11, nprobe=2
            ).collect()
            if r["vec_id"] != qid
        }
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.9, (hits, total)
