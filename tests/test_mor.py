"""Merge-on-read CDC mode: per-bucket delta stacks instead of bucket
rewrites — the write-amplification half of the copy-on-write/merge-on-
read trade (public designs: Hudi MOR, Iceberg v2 row-level upserts).

The contract under test: (a) reads through the stack overlay are
row-identical to the copy-on-write committer fed the same batches,
including time travel; (b) a batch writes O(batch) bytes — base files
keep their inodes; (c) the stack depth is bounded by construction
(inline compaction); (d) the lifecycle ops (point lookup, rollback,
vacuum, compact_buckets) understand stacks.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.sources.versioned import (
    MOR_MAX_STACK_DEPTH,
    VersionedTable,
    compact_buckets,
    streaming_cdc_committer,
    vacuum,
)

SCHEMA = "k long, v string, op string, seq long"


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def _batches(spark):
    """A deterministic I/U/D sequence with a key updated twice, a
    delete, a re-insert after delete, and seq values REUSED across
    batches (version order must dominate the merge)."""
    return [
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(60)], SCHEMA
        ),
        spark.createDataFrame(
            [(7, "u7a", "U", 1), (23, None, "D", 2), (41, "u41", "U", 3)],
            SCHEMA,
        ),
        spark.createDataFrame(
            [(7, "u7b", "U", 1), (23, "w23", "I", 2), (55, None, "D", 3)],
            SCHEMA,
        ),
    ]


def test_mor_reads_match_cow_including_time_travel(spark, tmp_path):
    cow = VersionedTable(str(tmp_path / "cow"))
    mor = VersionedTable(str(tmp_path / "mor"))
    sink_c = streaming_cdc_committer(cow, "k", seq_col="seq", n_buckets=8)
    sink_m = streaming_cdc_committer(
        mor, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    for i, b in enumerate(_batches(spark)):
        sink_c(b, i)
        sink_m(b, i)
    # live parity
    assert _rows(mor.read(spark)) == _rows(cow.read(spark))
    # time travel parity at every version
    cow_chain = [m["version"] for m in cow.committed_chain()][::-1]
    mor_chain = [m["version"] for m in mor.committed_chain()][::-1]
    for vc, vm in zip(cow_chain, mor_chain):
        assert _rows(mor.read(spark, version=vm)) == _rows(
            cow.read(spark, version=vc)
        )
    # spot-check semantics: last write wins, delete-then-reinsert lives
    live = dict(_rows(mor.read(spark)))
    assert live[7] == "u7b" and live[23] == "w23"
    assert 55 not in live


def test_mor_batch_writes_o_batch_and_keeps_base_inodes(spark, tmp_path):
    """The write-amplification claim: a 1-key update writes ONLY a
    delta file holding the batch's rows; every base file of the bucket
    keeps its path (copy-on-write would replace it with a full bucket
    rewrite)."""
    import pyarrow.parquet as pq

    t = VersionedTable(str(tmp_path / "tbl"))
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}" * 50, "I", i) for i in range(2000)], SCHEMA
        ),
        0,
    )
    v0 = t.current_version()
    base_files = dict(t._resolved(v0)["bucket_files"])
    sink(spark.createDataFrame([(3, "u3", "U", 1)], SCHEMA), 1)
    v1 = t.current_version()
    res = t._resolved(v1)
    # base files: byte-for-byte carried
    assert res["bucket_files"] == base_files
    # exactly one bucket gained a stack entry, holding exactly 1 row
    stacked = {b: st for b, st in res["bucket_deltas"].items() if st}
    assert len(stacked) == 1
    (b, st), = stacked.items()
    assert len(st) == 1
    delta_rows = sum(
        pq.read_metadata(os.path.join(t.root, f)).num_rows
        for f in st[0][1]
    )
    assert delta_rows == 1
    # the manifest is a delta carrying the MOR marker
    m = t._manifest(v1)
    assert "bucket_delta_files_new" in m["delta"]
    assert m["delta"]["bucket_files_new"] == {}
    # and the read overlays correctly
    live = dict(_rows(t.read(spark)))
    assert live[3] == "u3" and live[4] == "v4" * 50


def test_mor_stack_depth_is_bounded_by_inline_compaction(spark, tmp_path):
    """Hammering one key past MOR_MAX_STACK_DEPTH forces the
    overflowing batch to fold the bucket (base+stack+batch → one base
    file, stack cleared) — the read bound is structural."""
    t = VersionedTable(str(tmp_path / "tbl"))
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(40)], SCHEMA
        ),
        0,
    )
    hot = 3
    for bid in range(1, MOR_MAX_STACK_DEPTH + 3):
        sink(
            spark.createDataFrame(
                [(hot, f"u{bid}", "U", bid)], SCHEMA
            ),
            bid,
        )
        res = t._resolved(t.current_version())
        depth = max(
            (len(st) for st in res["bucket_deltas"].values()), default=0
        )
        assert depth <= MOR_MAX_STACK_DEPTH
    # at least one fold happened: some version's delta carries a
    # bucket_files_new rewrite with the stack cleared
    folds = 0
    for m in t.committed_chain():
        if "delta" in m and m["delta"].get("bucket_files_new"):
            folds += 1
    assert folds >= 1
    live = dict(_rows(t.read(spark)))
    assert live[hot] == f"u{MOR_MAX_STACK_DEPTH + 2}"
    # the change feed replays correctly THROUGH the fold version: the
    # fold's partition diffs (old base ⊕ full stack) vs the new base —
    # row-silent for everything the fold merely rewrote, one U for the
    # hot key per update version
    from anti_ddos_spark.sources.cdf import version_changes

    chain = [m["version"] for m in t.committed_chain()][::-1]
    feed = version_changes(spark, t, "k", chain[0], chain[-1]).collect()
    hot_ops = sorted(
        (r["_version"], r["v"]) for r in feed if r["k"] == hot and r["_op"] == "U"
    )
    assert [v for _ver, v in hot_ops] == [
        f"u{b}" for b in range(1, MOR_MAX_STACK_DEPTH + 3)
    ]
    # nothing but the hot key ever changes after the seed
    assert all(
        r["k"] == hot for r in feed if r["_version"] != chain[0]
    )


def test_mor_point_lookup_and_rollback_and_vacuum(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    for i, b in enumerate(_batches(spark)):
        sink(b, i)
    pre_roll = t.current_version()
    # point lookup reads the owning bucket's base+stack only
    got = t.read_point(spark, [7])
    assert [(r["k"], r["v"]) for r in got.collect()] == [(7, "u7b")]
    res = t._resolved(pre_roll)
    kb = t.key_buckets(spark, [7])
    allowed = set(res["bucket_files"].get(next(iter(kb[1])), []))
    for st in res["bucket_deltas"].values():
        for _v, fs in st:
            allowed |= set(fs)
    opened = {
        os.path.relpath(f.replace("file:", ""), t.root)
        for f in got.inputFiles()
    }
    assert opened <= allowed and opened
    # rollback to the mid version re-serves its overlay
    mid = [m["version"] for m in t.committed_chain()][::-1][1]
    mid_rows = _rows(t.read(spark, version=mid))
    t.rollback(mid)
    assert _rows(t.read(spark)) == mid_rows
    # vacuum keeps live stack files (retention = the rollback version)
    stats = vacuum(t, keep_versions=1, min_age_s=0)
    assert stats["dropped_manifests"] >= 1
    assert _rows(t.read(spark)) == mid_rows


def test_mor_compact_buckets_folds_stacks_and_reenables_cdf(
    spark, tmp_path
):
    from anti_ddos_spark.sources.cdf import (
        register_cdf_source,
        version_changes,
    )

    t = VersionedTable(str(tmp_path / "tbl"))
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    for i, b in enumerate(_batches(spark)):
        sink(b, i)
    pre = t.current_version()
    pre_rows = _rows(t.read(spark))
    res_pre = t._resolved(pre)
    stacked = {b for b, st in res_pre["bucket_deltas"].items() if st}
    assert stacked

    # the streaming CDF replays MOR versions: each side of a bucket
    # diff is (base, stack) replayed executor-side — the full replay
    # must hash-match the batch twin (which reads merged snapshots)
    register_cdf_source(spark)
    chain = [m["version"] for m in t.committed_chain()][::-1]
    import time as _time

    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", t.root)
        .option("key", "k")
        .option("start_version", -1)
        .load()
        .writeStream.format("memory")
        .queryName("mor_cdf")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    deadline = _time.time() + 30
    while (
        _time.time() < deadline
        and spark.table("mor_cdf").count() < 60
    ):
        _time.sleep(0.5)
    got = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in spark.table("mor_cdf").collect()
    )
    want = sorted(
        (r["k"], r["v"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", chain[0], chain[-1])
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert got == want
    ops = {(r[0], r[2]) for r in got}
    assert (7, "U") in ops and (23, "I") in ops and (55, "D") in ops
    spark.catalog.dropTempView("mor_cdf")

    # compaction folds the stacks, preserves rows, carries untouched
    # buckets verbatim, and is row-silent in the change feed
    untouched_bases = {
        b: fs
        for b, fs in res_pre["bucket_files"].items()
        if b not in stacked
    }
    post = compact_buckets(t, spark)
    assert post is not None
    res_post = t._resolved(post)
    assert not any(res_post["bucket_deltas"].values())
    # the stack-aware diff sees the fold as row-silent
    assert version_changes(spark, t, "k", post, post).count() == 0
    for b, fs in untouched_bases.items():
        assert res_post["bucket_files"][b] == fs
    assert _rows(t.read(spark)) == pre_rows
    # nothing left to compact → no-op
    assert compact_buckets(t, spark) is None
    # a COW batch over the compacted (stack-free) base stays pruned
    sink2 = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink2(spark.createDataFrame([(2, "z2", "U", 99)], SCHEMA), 100)
    m2 = t._manifest(t.current_version())
    assert "delta" in m2 and "bucket_delta_files_new" not in m2["delta"]


def test_cow_batch_over_mor_base_folds_stacks_not_loses_rows(
    spark, tmp_path
):
    """Committer-mode mixing: a copy-on-write batch landing on a table
    with live stacks must NOT prune (it would read base files only and
    silently drop stack rows) — it falls back to one full merge that
    folds every stack."""
    t = VersionedTable(str(tmp_path / "tbl"))
    sink_m = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    for i, b in enumerate(_batches(spark)):
        sink_m(b, i)
    assert any(t._resolved(t.current_version())["bucket_deltas"].values())
    sink_c = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink_c(spark.createDataFrame([(0, "z0", "U", 100)], SCHEMA), 100)
    res = t._resolved(t.current_version())
    assert not any(res["bucket_deltas"].values())
    live = dict(_rows(t.read(spark)))
    # the stack rows survived the fold, plus the COW update
    assert live[0] == "z0" and live[7] == "u7b" and live[23] == "w23"
    assert 55 not in live


def test_mor_read_tolerates_schema_evolution(spark, tmp_path):
    """r10 ADVICE: a MOR table whose batch schema gains a column
    mid-chain must still read — the new column is null-filled on base
    rows and on delta rows written before it existed (the same
    tolerance the copy-on-write path gets from mergeSchema)."""
    t = VersionedTable(str(tmp_path / "mor"))
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(20)], SCHEMA
        ),
        0,
    )
    wide = "k long, v string, extra long, op string, seq long"
    sink(spark.createDataFrame([(3, "u3", 99, "U", 1)], wide), 1)
    sink(
        spark.createDataFrame([(5, "u5", "U", 1)], SCHEMA), 2
    )  # narrow again after the wide batch
    rows = {r["k"]: (r["v"], r["extra"]) for r in t.read(spark).collect()}
    assert rows[3] == ("u3", 99)
    assert rows[5] == ("u5", None)
    assert rows[0] == ("v0", None)
    assert len(rows) == 20


def test_mor_read_plans_one_delta_scan_per_version(spark, tmp_path):
    """Round 12: the MOR overlay read makes ONE parquet scan per stack
    VERSION (plus the base), never one per (bucket, version) entry —
    the deltas subtree appears a fixed number of times in the physical
    plan (resolution, anti-join, union), so the total scan count is a
    function of stack DEPTH only. Pin: a table with 4x the buckets
    plans exactly the same number of scans (per-entry reads would scale
    it with the bucket count)."""
    from anti_ddos_spark.plans import plan_summary
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        streaming_cdc_committer,
    )

    schema = "k long, v string, op string, seq long"

    def build(nb):
        t = VersionedTable(str(tmp_path / f"tbl{nb}"))
        sink = streaming_cdc_committer(
            t, "k", seq_col="seq", n_buckets=nb, merge_on_read=True
        )
        sink(
            spark.createDataFrame(
                [(i, f"v{i}", "I", i) for i in range(64)], schema
            ),
            0,
        )
        sink(
            spark.createDataFrame(
                [(i, f"u{i}", "U", 100 + i) for i in range(64)], schema
            ),
            1,
        )
        sink(
            spark.createDataFrame(
                [(i, f"w{i}", "U", 200 + i) for i in range(0, 64, 2)],
                schema,
            ),
            2,
        )
        res = t._resolved(t.current_version())
        assert sum(1 for st in res["bucket_deltas"].values() if st) == nb
        return t

    t2, t8 = build(2), build(8)
    scans2 = plan_summary(t2.read(spark))["text"].count("Scan parquet")
    scans8 = plan_summary(t8.read(spark))["text"].count("Scan parquet")
    # depth-bounded: 4x the buckets, identical plan scan count
    assert scans2 == scans8, (scans2, scans8)
    # and well under the per-entry form (>= nb x depth scans at nb=8)
    assert scans8 < 8 * 2
    rows = {r["k"]: r["v"] for r in t8.read(spark).collect()}
    assert rows[0] == "w0" and rows[1] == "u1" and len(rows) == 64
