"""neardup_clusters transitivity: A~B and B~C must collapse A,B,C into
one cluster even when A and C are NOT direct near-duplicates — the
property candidate-pair output alone cannot express, and the reason the
operator exists (q39 hash-checks the full fixpoint against DuckDB's
recursive CTE; this pins the semantics on a readable planted case).
"""

from __future__ import annotations

from anti_ddos_spark.operators.dedup import minhash_candidates, neardup_clusters

BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " * 3


def _docs(spark):
    a = BASE + "kilo lima mike november"
    b = BASE + "kilo lima oscar papa"       # ~ a (shares BASE + kilo lima)
    c = BASE + "quebec romeo oscar papa"    # ~ b, further from a
    d = "completely different words entirely unrelated content here " * 5
    return spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id: long, text: string"
    )


def test_transitive_chain_collapses(spark):
    docs = _docs(spark)
    pairs = {
        (r.id_a, r.id_b): r.jaccard_pct
        for r in minhash_candidates(docs, k=4, bands=2).collect()
    }
    thr = 60
    edges = {k for k, j in pairs.items() if j >= thr}
    # the planted shape: 1-2 and 2-3 are edges, 1-3 is not
    assert (1, 2) in edges and (2, 3) in edges, (pairs, edges)
    assert (1, 3) not in edges, "chain must rely on transitivity"

    labels = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(docs, jaccard_pct_min=thr, k=4, bands=2).collect()
    }
    assert labels[1] == labels[2] == labels[3] == 1, labels
    assert labels[4] == 4, "singleton labels itself"


def test_narrow_banded_signature_equals_aggregate_form(spark):
    """minhash_banded_narrow (per-row array_min, the zero-shuffle form
    q74 streams with) must produce the exact band keys of the
    explode+groupBy signature used by minhash_candidates/q35 — same
    arithmetic, different physical shape."""
    import pyspark.sql.functions as F

    from anti_ddos_spark.operators.dedup import (
        lsh_bands,
        minhash_banded_narrow,
        shingle_base_hash,
        shingles_of_words,
        uhash_params,
        words,
        UHASH_M,
    )

    docs = _docs(spark)
    k, bands = 8, 4
    narrow = {
        (r.doc_id, r.band_id, r.band_key)
        for r in minhash_banded_narrow(docs, k=k, bands=bands).collect()
    }
    pre = docs.select(
        "doc_id", F.col("text").alias("_txt"), words(F.col("text")).alias("_ws")
    )
    sh = pre.select(
        "doc_id", F.explode(shingles_of_words(F.col("_ws"), F.col("_txt"))).alias("s")
    )
    base = shingle_base_hash(F.col("s"))
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min((base * F.lit(uhash_params(i)[0]) + F.lit(uhash_params(i)[1])) % F.lit(UHASH_M)).alias(f"minhash_{i}")
            for i in range(k)
        ]
    )
    agg = {
        (r.doc_id, r.band_id, r.band_key)
        for r in mins.select(
            "doc_id",
            F.posexplode(lsh_bands([f"minhash_{i}" for i in range(k)], bands=bands)).alias(
                "band_id", "band_key"
            ),
        )
        .withColumn("band_id", F.col("band_id").cast("int"))
        .collect()
    }
    assert narrow == agg and len(narrow) == 4 * bands


def test_checkpoint_blocks_freed(spark):
    """_unpersist_local_checkpoint must actually release the persisted
    blocks (ADVICE r2: the old .rdd.unpersist() was a no-op — .rdd is a
    derived, never-persisted RDD)."""
    from anti_ddos_spark.operators.dedup import _unpersist_local_checkpoint

    sc = spark.sparkContext

    def pids():
        m = sc._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = pids()
    df = spark.range(100).selectExpr("id", "id * 2 AS v").localCheckpoint(eager=True)
    added = pids() - before
    assert added, "localCheckpoint should persist an RDD"
    _unpersist_local_checkpoint(df)
    assert not (pids() & added), "checkpoint blocks must be freed eagerly"


def test_spread_small_scan_policy(spark, tmp_path):
    """The parallelism guard spreads a tiny local scan across the
    cluster's cores (content unchanged), leaves FILELESS frames
    untouched (identity — the no-op branch must actually be a no-op),
    and its pure decision takes every branch correctly."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.dedup import (
        SCAN_SPREAD_BYTES_CAP,
        _SCAN_TASK_BYTES,
        _should_spread,
        spread_small_scan,
    )

    p = str(tmp_path / "docs.parquet")
    spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_small_scan(df, "doc_id")
    cores = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= min(cores, 2)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(1000))
    # a frame with no input files is returned IDENTICALLY (total=0 path)
    fileless = spark.range(10).select(F.col("id").alias("doc_id"))
    assert spread_small_scan(fileless, "doc_id") is fileless
    # pure decision branches: ceil split (floor would spread a scan
    # that already opens >= cores tasks), cap, and zero/negative bytes
    assert _should_spread(1, 8)
    assert not _should_spread(0, 8)
    assert not _should_spread(SCAN_SPREAD_BYTES_CAP + 1, 9999)
    # 900 MB / 128 MB = 7.03 -> ceil 8 tasks: NOT starved on 8 cores...
    assert not _should_spread(900 << 20, 8)
    # ...but starved on 32
    assert _should_spread(900 << 20, 32)
    assert not _should_spread(8 * _SCAN_TASK_BYTES, 8)
    # r9 ADVICE: once the running total exceeds the cap the decision is
    # determined — the driver must stop stat-ing files, so a large
    # local input doesn't pay O(files) getsize calls for a no-op
    import anti_ddos_spark.operators.dedup as _dd

    calls = {"n": 0}
    real_getsize = _dd.os.path.getsize

    def counting_getsize(path):
        calls["n"] += 1
        return SCAN_SPREAD_BYTES_CAP  # first file alone exceeds the cap

    class _FakeScan:
        sparkSession = spark

        def inputFiles(self):
            return [f"file:/fake/{i}.parquet" for i in range(1000)]

    _dd.os.path.getsize = counting_getsize
    try:
        fake = _FakeScan()
        assert _dd.spread_small_scan(fake, "doc_id") is fake
    finally:
        _dd.os.path.getsize = real_getsize
    assert calls["n"] == 2, f"expected early exit after 2 stats, got {calls['n']}"
