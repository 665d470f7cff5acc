"""Versioned snapshot table: time travel, rollback, snapshot isolation,
optimistic-concurrency conflict, and data-immutability (inode) proofs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.sources.versioned import CommitConflict, VersionedTable


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@pytest.fixture(params=["local", "cas"])
def table(spark, tmp_path, request, monkeypatch):
    """Every test in this suite runs under BOTH publish backends (r10
    verdict task #7): the default local flock+O_EXCL+rename and the
    object-store CAS emulation (no advisory lock, conditional-PUT
    pointer flip, losers orphan their manifest). The env var is how
    _default_backend selects, so tables a test constructs itself — and
    child processes — inherit the same backend."""
    if request.param == "cas":
        monkeypatch.setenv("SPARK_GRAFT_PUBLISH_BACKEND", "cas")
    return spark, VersionedTable(str(tmp_path / "tbl"))


def test_append_overwrite_time_travel_and_rollback(table):
    spark, t = table
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    d2 = spark.createDataFrame([(3, "c")], "k long, v string")
    d3 = spark.createDataFrame([(9, "z")], "k long, v string")

    v0 = t.commit(d1, mode="overwrite")
    v1 = t.commit(d2, mode="append")
    assert (v0, v1) == (0, 1)
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel: v0 unchanged after the append
    assert _rows(t.read(spark, version=0)) == [(1, "a"), (2, "b")]

    v2 = t.commit(d3, mode="overwrite")
    assert _rows(t.read(spark)) == [(9, "z")]
    # every historical version still readable
    assert _rows(t.read(spark, version=1)) == [(1, "a"), (2, "b"), (3, "c")]

    v3 = t.rollback(1)
    assert v3 == v2 + 1
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    # rollback is a new version; the rolled-past version stays readable
    assert _rows(t.read(spark, version=v2)) == [(9, "z")]
    assert t.versions() == [0, 1, 2, 3]


def test_rollback_moves_no_data(table):
    spark, t = table
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    v1 = t.commit(spark.createDataFrame([(2, "b")], "k long, v string"))

    def inodes():
        out = {}
        for dirpath, _, names in os.walk(os.path.join(t.root, "data")):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    out[p] = os.stat(p).st_ino
        return out

    before = inodes()
    t.rollback(0)
    assert inodes() == before  # manifest-only: every data file untouched


def test_snapshot_isolation_under_concurrent_commit(table):
    spark, t = table
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    # a reader resolves its snapshot...
    snap = t.read(spark, version=t.current_version())
    # ...a writer overwrites the live table...
    t.commit(
        spark.createDataFrame([(7, "q")], "k long, v string"),
        mode="overwrite",
    )
    # ...the reader's already-resolved snapshot is unaffected
    assert _rows(snap) == [(1, "a")]
    assert _rows(t.read(spark)) == [(7, "q")]


def test_optimistic_conflict_detection(table):
    spark, t = table
    base = t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    # writer B publishes on top of base
    t.commit(
        spark.createDataFrame([(2, "b")], "k long, v string"),
        expected_version=base,
    )
    # writer A, also based on `base`, must fail — not silently clobber
    with pytest.raises(CommitConflict):
        t.commit(
            spark.createDataFrame([(3, "c")], "k long, v string"),
            expected_version=base,
        )
    # the loser left no published manifest and the table is intact
    assert t.versions() == [0, 1]
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]


def test_read_empty_table_raises(table):
    spark, t = table
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_foreach_batch_committer_is_exactly_once(table, tmp_path):
    """A REAL availableNow stream commits micro-batches as versions;
    re-delivering a batch id (the failure-retry contract) is a no-op,
    so table state is exactly-once even under at-least-once delivery."""
    from anti_ddos_spark.sources.versioned import foreach_batch_committer

    spark, t = table
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, chr(97 + i % 3)) for i in range(20)], "k long, v string"
    ).coalesce(2).write.parquet(src)

    sink = foreach_batch_committer(t)
    q = (
        spark.readStream.schema("k long, v string")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert _rows(t.read(spark)) == sorted(
        (i, chr(97 + i % 3)) for i in range(20)
    )
    v_before = t.current_version()

    # simulate the failure-retry: the engine re-delivers batch 0
    batch0 = spark.read.parquet(src)
    sink(batch0, 0)
    assert t.current_version() == v_before  # skipped, no new version
    assert t.read(spark).count() == 20  # and no double-append

    # a genuinely NEW batch id commits a new version
    sink(spark.createDataFrame([(99, "zz")], "k long, v string"), 999)
    assert t.current_version() == v_before + 1
    assert t.read(spark).count() == 21


def test_orphan_manifest_neither_blocks_nor_suppresses(table):
    """Crash between manifest write and pointer flip leaves an ORPHAN:
    it must not block future version allocation, and its batch_id must
    not suppress the re-delivered batch (that would be data loss)."""
    import json
    import os

    from anti_ddos_spark.sources.versioned import foreach_batch_committer

    spark, t = table
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    # hand-craft the crash artifact: manifest v1 exists, pointer still 0
    orphan = {
        "version": 1,
        "base": 0,
        "mode": "append",
        "files": [],
        "batch_id": 5,
        "last_batch_id": 5,
    }
    with open(os.path.join(t.root, "manifests", "v1.json"), "w") as f:
        json.dump(orphan, f)
    assert t.current_version() == 0
    assert t.last_batch_id() is None  # chain walk ignores the orphan

    sink = foreach_batch_committer(t)
    sink(spark.createDataFrame([(5, "e")], "k long, v string"), 5)
    # committed past the orphan number, rows landed, id now on-chain
    assert t.current_version() == 2
    assert t.last_batch_id() == 5
    assert _rows(t.read(spark)) == [(1, "a"), (5, "e")]
    # and the re-delivery of batch 5 is now a no-op
    sink(spark.createDataFrame([(6, "f")], "k long, v string"), 5)
    assert t.current_version() == 2


def test_streaming_cdc_committer_merges_exactly_once(table, tmp_path):
    """REAL two-micro-batch streaming MERGE into the versioned table:
    batch 1 inserts, batch 2 (a later file, maxFilesPerTrigger=1)
    updates/deletes; every micro-batch lands as a time-travelable
    version, and re-delivering a batch id is a no-op."""
    import time

    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    spark, t = table
    src = str(tmp_path / "cdc_src")
    schema = "k long, v string, op string, seq long"
    b1 = spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", "I", 2), (3, "c", "I", 3)], schema
    )
    b1.coalesce(1).write.parquet(src)
    time.sleep(1.1)  # later mtime → second micro-batch (q114 pattern)
    b2 = spark.createDataFrame(
        [(2, "B", "U", 4), (3, None, "D", 5), (4, "d", "I", 6)], schema
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    sink = streaming_cdc_committer(t, "k", seq_col="seq")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    assert _rows(t.read(spark)) == [(1, "a"), (2, "B"), (4, "d")]
    # one version per micro-batch; v-first is the post-batch-1 state
    chain = t.committed_chain()
    assert len(chain) == 2
    first_v = chain[-1]["version"]
    assert _rows(t.read(spark, version=first_v)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # re-delivery of an already-committed batch id: no-op
    v_before = t.current_version()
    sink(b2, 1)
    assert t.current_version() == v_before
    assert _rows(t.read(spark)) == [(1, "a"), (2, "B"), (4, "d")]


def test_compact_and_vacuum_lifecycle(table):
    """compact() rewrites the live snapshot as a new version without
    touching older versions' files; vacuum() drops everything outside
    the retention window — including crash orphans — while time travel
    keeps working inside it."""
    import os

    from anti_ddos_spark.sources.versioned import compact, vacuum

    spark, t = table
    for i in range(4):  # 4 appends → 4 small data dirs
        t.commit(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string")
        )
    assert len(os.listdir(os.path.join(t.root, "data"))) == 4

    v_c = compact(t, spark, n_files=1)
    assert t.read(spark).count() == 4
    # pre-compaction version still reads fine (its files untouched)
    assert t.read(spark, version=v_c - 1).count() == 4

    # keep only the compacted head: every append-era manifest expires,
    # and with them the four small data dirs become unreferenced
    stats = vacuum(t, keep_versions=1, min_age_s=0)
    assert stats["dropped_manifests"] == 4  # the v0..v3 append chain
    assert stats["dropped_data_dirs"] == 4
    assert t.versions() == [v_c]
    assert t.read(spark).count() == 4
    # the retained manifest was re-rooted
    assert t._manifest(v_c)["base"] is None
    # and the table still accepts new commits after the GC
    t.commit(spark.createDataFrame([(9, "z")], "k long, v string"))
    assert t.read(spark).count() == 5


def test_vacuum_age_gate_and_empty_table(table):
    """The age gate protects a lock-free in-flight commit's unpublished
    data dir; an uncommitted table is a no-op entirely."""
    from anti_ddos_spark.sources.versioned import vacuum

    spark, t = table
    # empty table: nothing deleted, no crash
    assert vacuum(t) == {
        "dropped_manifests": 0,
        "dropped_orphan_manifests": 0,
        "dropped_data_dirs": 0,
    }

    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    # simulate an in-flight commit: data dir written, not yet published
    unpublished = t._write_data_dir(
        spark.createDataFrame([(2, "b")], "k long, v string")
    )
    import os

    stats = vacuum(t, keep_versions=1)  # default min_age_s: fresh → kept
    assert stats["dropped_data_dirs"] == 0
    assert os.path.exists(
        os.path.join(t.root, os.path.dirname(unpublished[0]))
    )
    # past the age gate the same dir is garbage and goes
    stats = vacuum(t, keep_versions=1, min_age_s=0)
    assert stats["dropped_data_dirs"] == 1


def test_streaming_cdc_rewrite_is_bucket_bounded(table, tmp_path):
    """The round-8 scale contract: a micro-batch rewrites ONLY the
    key-hash buckets its keys touch. REAL two-batch streaming run:
    batch 1 seeds 40 keys across the 16-bucket layout, batch 2 changes
    a single key — every untouched bucket's files must keep their
    EXACT paths and inodes in the new manifest (carried forward, never
    rescanned or rewritten), and only the touched bucket's entry may
    change."""
    import time

    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    spark, t = table
    src = str(tmp_path / "cdc_src")
    schema = "k long, v string, op string, seq long"
    b1 = spark.createDataFrame(
        [(i, f"v{i}", "I", i) for i in range(40)], schema
    )
    b1.coalesce(1).write.parquet(src)
    time.sleep(1.1)
    b2 = spark.createDataFrame([(7, "CHANGED", "U", 100)], schema)
    b2.coalesce(1).write.mode("append").parquet(src)

    sink = streaming_cdc_committer(t, "k", seq_col="seq")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    chain = t.committed_chain()
    assert len(chain) == 2
    m_new, m_old = chain[0], chain[1]
    assert m_old["n_buckets"] == 16 and m_new["n_buckets"] == 16

    # round 9: batch 2 is a DELTA manifest — only its touched bucket
    # travels; the carried buckets exist by reference to the base
    assert "files" not in m_new and "delta" in m_new
    assert len(m_new["delta"]["touched"]) == 1
    r_old = t._resolved(m_old["version"])
    r_new = t._resolved(m_new["version"])

    changed = {
        b
        for b in set(r_old["bucket_files"]) | set(r_new["bucket_files"])
        if r_old["bucket_files"].get(b) != r_new["bucket_files"].get(b)
    }
    assert len(changed) == 1  # exactly key 7's bucket
    untouched = set(r_old["bucket_files"]) - changed
    assert len(untouched) >= 10  # 40 keys spread over 16 buckets
    for b in untouched:
        for rel in r_old["bucket_files"][b]:
            assert rel in r_new["files"]
            assert os.path.exists(os.path.join(t.root, rel))
    # inode proof: carried files are the SAME files, not rewrites
    inodes_v1 = {
        rel: os.stat(os.path.join(t.root, rel)).st_ino
        for b in untouched
        for rel in r_old["bucket_files"][b]
    }
    for rel, ino in inodes_v1.items():
        assert os.stat(os.path.join(t.root, rel)).st_ino == ino

    # merge semantics unchanged by the pruning
    rows = _rows(t.read(spark))
    assert (7, "CHANGED") in rows and len(rows) == 40
    # and both versions time-travel cleanly
    assert (7, "v7") in _rows(t.read(spark, version=m_old["version"]))


def test_streaming_cdc_rebuckets_after_compact(table):
    """compact() publishes an unbucketed manifest; the next CDC batch
    must fall back to ONE full-table merge that re-establishes the
    bucket layout (not corrupt or drop rows), after which pruning
    resumes."""
    from anti_ddos_spark.sources.versioned import (
        compact,
        streaming_cdc_committer,
    )

    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq")
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(10)], schema
        ),
        0,
    )
    compact(t, spark, n_files=1)
    assert "bucket_files" not in t._manifest(t.current_version())

    sink(spark.createDataFrame([(3, "X", "U", 50)], schema), 1)
    m = t._manifest(t.current_version())
    assert m["n_buckets"] == 16  # layout re-established
    rows = _rows(t.read(spark))
    assert len(rows) == 10 and (3, "X") in rows


def test_txn_app_id_scopes_idempotency(table):
    """Two streaming queries sharing one table (or a checkpoint reset
    restarting batch ids at 0) must not share an idempotency counter:
    with txn_app_id each writer identity tracks its own last batch id,
    so app B's batch 0 commits even after app A committed batch 5."""
    from anti_ddos_spark.sources.versioned import foreach_batch_committer

    spark, t = table
    a = foreach_batch_committer(t, txn_app_id="qA")
    b = foreach_batch_committer(t, txn_app_id="qB")
    df = lambda k: spark.createDataFrame([(k, "x")], "k long, v string")  # noqa: E731

    a(df(1), 5)
    assert t.read(spark).count() == 1
    # same app, replayed id: skipped
    a(df(2), 5)
    assert t.read(spark).count() == 1
    # DIFFERENT app, lower id: must commit (the ADVICE data-loss case)
    b(df(3), 0)
    assert t.read(spark).count() == 2
    assert t.last_batch_id("qA") == 5
    assert t.last_batch_id("qB") == 0
    # counters survive a plain commit + compact in between
    t.commit(df(4))
    from anti_ddos_spark.sources.versioned import compact

    compact(t, spark, n_files=1)
    assert t.last_batch_id("qA") == 5
    a(df(5), 5)  # still suppressed post-compact
    assert t.read(spark).count() == 3
    a(df(6), 6)
    assert t.read(spark).count() == 4


def test_vacuum_respects_carried_bucket_files(table):
    """Bucketed-CDC versions reference files across MANY data dirs
    (carried buckets keep their original dirs). vacuum must treat a dir
    as live if ANY retained manifest references ANY file inside it —
    and still collect dirs that fell wholly out of retention."""
    import os

    from anti_ddos_spark.sources.versioned import (
        streaming_cdc_committer,
        vacuum,
    )

    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq")
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(40)], schema
        ),
        0,
    )
    sink(spark.createDataFrame([(7, "X", "U", 100)], schema), 1)
    sink(spark.createDataFrame([(13, "Y", "U", 101)], schema), 2)
    n_dirs_before = len(os.listdir(os.path.join(t.root, "data")))
    assert n_dirs_before == 3

    stats = vacuum(t, keep_versions=1, min_age_s=0)
    # v0/v1 manifests expire; but the batch-0 dir still holds CARRIED
    # bucket files referenced by the live v2 manifest — it must survive.
    assert stats["dropped_manifests"] == 2
    live = t._manifest(t.current_version())
    live_dirs = {rel.split(os.sep)[1] for rel in live["files"]}
    remaining = set(os.listdir(os.path.join(t.root, "data")))
    assert live_dirs <= remaining
    for rel in live["files"]:
        assert os.path.exists(os.path.join(t.root, rel))
    rows = _rows(t.read(spark))
    assert len(rows) == 40 and (7, "X") in rows and (13, "Y") in rows
    # and the table keeps merging after GC
    sink(spark.createDataFrame([(2, "Z", "U", 102)], schema), 3)
    assert (2, "Z") in _rows(t.read(spark))


def test_bucketed_cdc_random_sequences_match_dict_reference(table):
    """Property test for the round-8 committer: any sequence of CDC
    batches (hash-derived ops/keys/values, 3 deterministic scenarios x
    4 batches) must leave the table equal to a plain Python dict replay
    — upsert on U/I, delete on D, latest-seq-wins inside a batch —
    regardless of which buckets each batch touches or how often the
    layout carries files forward."""
    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    spark, t_ = table
    schema = "k long, v string, op string, seq long"
    import hashlib

    def h(*parts) -> int:
        return int.from_bytes(
            hashlib.md5("|".join(map(str, parts)).encode()).digest()[:4],
            "big",
        )

    for scenario in range(3):
        import shutil
        import tempfile

        from anti_ddos_spark.sources.versioned import VersionedTable

        root = tempfile.mkdtemp(prefix=f"cdc_prop_{scenario}_")
        t = VersionedTable(root)
        sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
        ref: dict[int, str] = {}
        seq = 0
        for bid in range(4):
            rows = []
            staged: dict[int, tuple[int, str, str]] = {}
            for i in range(25):
                k = h(scenario, bid, i, "k") % 30
                op = "UID"[h(scenario, bid, i, "op") % 3]
                v = f"s{scenario}b{bid}i{i}"
                seq += 1
                rows.append((k, v, op, seq))
                staged[k] = (seq, op, v)  # latest seq per key wins
            for k, (_s, op, v) in staged.items():
                if op == "D":
                    ref.pop(k, None)
                else:
                    ref[k] = v
            sink(spark.createDataFrame(rows, schema), bid)
        got = dict(_rows(t.read(spark)))
        assert got == ref, (scenario, got, ref)
        shutil.rmtree(root, ignore_errors=True)


def test_cdc_delete_everything_leaves_readable_empty_snapshot(table):
    """Round 9 (ADVICE): a CDC batch that deletes ALL remaining rows
    writes no parquet files (partitionBy on an empty frame), so the
    published manifest has files=[] — the live snapshot must still read
    as an EMPTY table with the recorded schema, not raise; time travel
    to the pre-delete version keeps working; and a following insert
    batch revives the table."""
    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=4)
    sink(
        spark.createDataFrame([(1, "a", "I", 1), (2, "b", "I", 2)], schema),
        0,
    )
    v_full = t.current_version()
    sink(
        spark.createDataFrame(
            [(1, None, "D", 3), (2, None, "D", 4)], schema
        ),
        1,
    )
    live = t.read(spark)
    assert live.count() == 0
    assert live.columns == ["k", "v"]
    assert dict(live.dtypes) == {"k": "bigint", "v": "string"}
    # empty snapshot still composes with the normal reader-side ops
    assert live.filter(F.col("k") > 0).count() == 0
    # time travel is unaffected
    assert _rows(t.read(spark, version=v_full)) == [(1, "a"), (2, "b")]
    # and the table revives on the next insert batch
    sink(spark.createDataFrame([(5, "e", "I", 5)], schema), 2)
    assert _rows(t.read(spark)) == [(5, "e")]


def test_delta_manifest_size_is_o_touched_not_o_table(table, monkeypatch):
    """Round 9 (r8 verdict task #2): a pruned CDC commit's manifest
    carries ONLY the touched buckets (carried state travels by
    reference to the base), so manifest bytes per commit are O(touched
    buckets), not O(table files); every MANIFEST_DELTA_DEPTH_MAX-th
    commit materializes a full manifest so resolves stay bounded; and
    resolution at every depth equals the relational truth."""
    import json
    import os

    from anti_ddos_spark.sources import versioned as V
    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    monkeypatch.setattr(V, "MANIFEST_DELTA_DEPTH_MAX", 3)
    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    # seed: fills many buckets → FULL manifest (base None)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(64)], schema
        ),
        0,
    )
    m0 = t._manifest(t.current_version())
    assert "files" in m0 and len(m0["bucket_files"]) >= 12

    def msize(v):
        return os.path.getsize(
            os.path.join(t.root, "manifests", f"v{v}.json")
        )

    full_size = msize(t.current_version())
    # single-key batches → delta manifests with exactly 1 touched bucket
    for bid in (1, 2, 3):
        sink(
            spark.createDataFrame([(7, f"c{bid}", "U", 100 + bid)], schema),
            bid,
        )
        m = t._manifest(t.current_version())
        assert "files" not in m and len(m["delta"]["touched"]) == 1
        assert m["delta_depth"] == bid
        # O(touched): the delta manifest is a fraction of the full one
        assert msize(t.current_version()) < full_size / 2
    # depth cap: the 4th pruned commit materializes a full manifest
    sink(spark.createDataFrame([(7, "c4", "U", 200)], schema), 4)
    m4 = t._manifest(t.current_version())
    assert "files" in m4 and "delta" not in m4
    assert len(m4["bucket_files"]) == len(m0["bucket_files"])
    # correctness across the whole chain: live state + time travel
    rows = _rows(t.read(spark))
    assert len(rows) == 64 and (7, "c4") in rows
    chain = t.committed_chain()
    assert (7, "c2") in _rows(t.read(spark, version=chain[2]["version"]))
    # version allocation came off the counter, not a listdir
    assert [m["version"] for m in chain] == [4, 3, 2, 1, 0]


def test_append_sink_publishes_bounded_delta_manifests(table, monkeypatch):
    """The plain append sink gets the same manifest bound: each batch's
    manifest carries only that batch's files; reads resolve the chain;
    the depth cap rematerializes."""
    from anti_ddos_spark.sources import versioned as V
    from anti_ddos_spark.sources.versioned import foreach_batch_committer

    monkeypatch.setattr(V, "MANIFEST_DELTA_DEPTH_MAX", 2)
    spark, t = table
    sink = foreach_batch_committer(t)
    for bid in range(4):
        sink(
            spark.createDataFrame([(bid, f"b{bid}")], "k long, v string"),
            bid,
        )
    ms = {m["version"]: m for m in t.committed_chain()}
    assert "files" in ms[0]                       # first commit: full
    assert "delta_append" in ms[1] and "delta_append" in ms[2]
    assert len(ms[1]["delta_append"]["files_new"]) >= 1
    assert "files" in ms[3] and len(ms[3]["files"]) >= 4  # cap: full again
    assert _rows(t.read(spark)) == [(0, "b0"), (1, "b1"), (2, "b2"), (3, "b3")]
    assert _rows(t.read(spark, version=2)) == [(0, "b0"), (1, "b1"), (2, "b2")]


def test_buckets_for_policy_and_growth_rebucket(table, monkeypatch):
    """buckets_for sizes the layout from rows (power of two, clamped;
    the r8 probe's 800k→64 operating point pinned); with n_buckets
    unset the committer re-buckets via one full merge when per-bucket
    row counts show the table outgrew its layout 4x, then resumes
    pruned deltas on the new layout."""
    from anti_ddos_spark.sources import versioned as V
    from anti_ddos_spark.sources.versioned import (
        buckets_for,
        streaming_cdc_committer,
    )

    assert buckets_for(0) == 16
    assert buckets_for(100) == 16
    assert buckets_for(800_000) == 64        # the measured operating point
    assert buckets_for(10_000_000) == 1024
    assert buckets_for(10**12) == 4096       # clamped
    # monotone in rows
    assert buckets_for(2_000_000) >= buckets_for(200_000)

    # shrink the target so growth triggers at unit scale
    monkeypatch.setattr(V, "CDC_TARGET_ROWS_PER_BUCKET", 1)
    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq")  # policy mode
    sink(
        spark.createDataFrame([(i, "a", "I", i) for i in range(20)], schema),
        0,
    )
    nb0 = t._manifest(t.current_version())["n_buckets"]
    assert nb0 == buckets_for(20) == 32
    # grow the table 5x past the 4x threshold; the growth batch itself
    # still lands on the old layout (the policy reads BASE-state row
    # counts) ...
    sink(
        spark.createDataFrame(
            [(i, "b", "I", 1000 + i) for i in range(20, 700)], schema
        ),
        1,
    )
    assert t._manifest(t.current_version())["n_buckets"] == nb0
    # ... and the NEXT batch re-buckets via one full merge
    sink(spark.createDataFrame([(3, "z", "U", 9999)], schema), 2)
    m = t._manifest(t.current_version())
    assert m["n_buckets"] > nb0 == 32
    assert "files" in m          # the re-bucketing commit is FULL
    rows = dict(_rows(t.read(spark)))
    assert rows[3] == "z" and len(rows) == 700
    # and pruned deltas resume on the new layout
    sink(spark.createDataFrame([(5, "w", "U", 10000)], schema), 3)
    m2 = t._manifest(t.current_version())
    assert "delta" in m2 and m2["n_buckets"] == m["n_buckets"]
    rows = dict(_rows(t.read(spark)))
    assert rows[5] == "w" and len(rows) == 700


# --- round 10: manifest-level file skipping (r9 verdict task #3) -----------


def test_manifest_stats_skip_files_on_selective_read(table):
    """A selective read must hand Spark O(matching files), decided from
    MANIFEST stats alone (no footer walk): 8 single-file commits with
    disjoint key ranges; an equality read opens exactly 1 file, a range
    read opens exactly the overlapping files, and results equal the
    unpruned read + row filter."""
    spark, t = table
    for i in range(8):
        df = spark.createDataFrame(
            [(i * 100 + j, f"v{i}_{j}") for j in range(100)],
            "k long, v string",
        ).coalesce(1)
        t.commit(df, mode="append", stats_cols=["k"])

    full = t.read(spark)
    assert len(full.inputFiles()) == 8

    kept, skipped = t.pruned_files(
        t.current_version(), [("k", "==", 250)]
    )
    assert len(kept) == 1 and skipped == 7

    sel = t.read(spark, filters=[("k", "==", 250)])
    assert len(sel.inputFiles()) == 1
    assert _rows(sel.filter(F.col("k") == 250)) == [(250, "v2_50")]

    rng = t.read(spark, filters=[("k", ">=", 150), ("k", "<", 450)])
    assert len(rng.inputFiles()) == 4  # files 1-4 overlap [150, 450)
    want = sorted(
        (r["k"], r["v"])
        for r in full.filter((F.col("k") >= 150) & (F.col("k") < 450)).collect()
    )
    got = sorted(
        (r["k"], r["v"])
        for r in rng.filter((F.col("k") >= 150) & (F.col("k") < 450)).collect()
    )
    assert got == want and len(want) == 300


def test_skip_is_conservative_without_stats(table):
    """Files committed WITHOUT stats are always kept — pruning can only
    drop files whose recorded range proves them cold."""
    spark, t = table
    t.commit(
        spark.createDataFrame([(1, "a")], "k long, v string"),
        stats_cols=["k"],
    )
    t.commit(
        spark.createDataFrame([(1000, "z")], "k long, v string")
    )  # no stats recorded
    kept, skipped = t.pruned_files(t.current_version(), [("k", "==", 1000)])
    # the stats-bearing file is provably cold; the stats-less file stays
    assert skipped == 1
    df = t.read(spark, filters=[("k", "==", 1000)])
    assert _rows(df.filter(F.col("k") == 1000)) == [(1000, "z")]


def test_fully_pruned_read_keeps_schema_and_empty_result(table):
    spark, t = table
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        stats_cols=["k"],
    )
    df = t.read(spark, filters=[("k", "==", 777)])
    assert df.columns == ["k", "v"]
    assert df.filter(F.col("k") == 777).count() == 0


def test_cdc_delta_manifests_carry_stats_and_prune_reads(table):
    """The CDC committer records key-range stats on the SAME footer
    read as row counts; delta manifests carry them (file_stats_new);
    a key-selective read of the live snapshot opens only that key's
    bucket files; rollback and vacuum re-root preserve stats."""
    from anti_ddos_spark.sources.versioned import streaming_cdc_committer, vacuum

    spark, t = table
    schema = "k long, v string, op string, seq long"
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(64)], schema
        ),
        0,
    )
    sink(spark.createDataFrame([(7, "u7", "U", 100)], schema), 1)
    m = t._manifest(t.current_version())
    assert "delta" in m and m["delta"].get("file_stats_new")

    res = t._resolved(t.current_version())
    n_files = len(res["files"])
    assert set(res["file_stats"]) == set(res["files"])  # full coverage
    kept, skipped = t.pruned_files(t.current_version(), [("k", "==", 7)])
    assert skipped > 0 and len(kept) < n_files
    sel = t.read(spark, filters=[("k", "==", 7)])
    assert len(sel.inputFiles()) == len(kept)
    assert dict(_rows(sel.filter(F.col("k") == 7)))[7] == "u7"

    # rollback to the seed version carries its stats forward
    rb = t.rollback(0)
    res_rb = t._resolved(rb)
    assert res_rb["file_stats"]
    # vacuum re-root: the oldest kept manifest materializes WITH stats
    sink(spark.createDataFrame([(9, "u9", "U", 200)], schema), 2)
    vacuum(t, keep_versions=1, min_age_s=0)
    res_v = t._resolved(t.current_version())
    assert set(res_v["file_stats"]) == set(res_v["files"])
    sel2 = t.read(spark, filters=[("k", "==", 9)])
    assert len(sel2.inputFiles()) < len(res_v["files"])
    assert dict(_rows(sel2.filter(F.col("k") == 9)))[9] == "u9"


def test_zorder_compact_records_stats_for_interleaved_cols(table):
    from anti_ddos_spark.sources.versioned import compact

    spark, t = table
    df = spark.createDataFrame(
        [(i, i % 50, f"v{i}") for i in range(2000)],
        "k long, g long, v string",
    )
    t.commit(df)
    compact(t, spark, n_files=8, zorder_cols=["k", "g"])
    res = t._resolved(t.current_version())
    assert set(res["file_stats"]) == set(res["files"])
    # z-order on (k, g): a tight k-range read opens a strict subset
    kept, skipped = t.pruned_files(
        t.current_version(), [("k", ">=", 0), ("k", "<=", 99)]
    )
    assert skipped > 0
    sel = t.read(spark, filters=[("k", ">=", 0), ("k", "<=", 99)])
    assert (
        sel.filter((F.col("k") >= 0) & (F.col("k") <= 99)).count() == 100
    )


def test_read_merge_schema_unions_drifted_generations(table):
    """Additive schema evolution through the snapshot read: a later
    append ADDS a column; merge_schema=True serves the union schema
    with nulls for pre-drift files (without it Spark takes one file's
    schema and silently drops the drifted column); time travel to the
    pre-drift version is unaffected."""
    spark, t = table
    t.commit(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.commit(
        spark.createDataFrame(
            [(2, "b", 99)], "k long, v string, extra long"
        ),
        mode="append",
    )
    merged = t.read(spark, merge_schema=True)
    assert set(merged.columns) == {"k", "v", "extra"}
    rows = {r["k"]: r["extra"] for r in merged.collect()}
    assert rows == {1: None, 2: 99}
    # pre-drift version keeps its own (narrower) schema
    assert set(t.read(spark, version=0, merge_schema=True).columns) == {
        "k", "v",
    }


def test_point_lookup_reads_only_owning_buckets(table):
    """Point lookup on the CDC key serves ONLY the owning buckets'
    files: the key→bucket routing is the committer's own xxhash64
    expression evaluated on the lookup literals, so the manifest alone
    names the files — no stat could do this in a hash layout (per-file
    key ranges are all wide)."""
    from anti_ddos_spark.sources.versioned import streaming_cdc_committer

    spark, t = table
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(400)],
            "k long, v string, op string, seq long",
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(7, "u7", "U", 1000), (250, None, "D", 1001)],
            "k long, v string, op string, seq long",
        ),
        1,
    )
    res = t._resolved(t.current_version())
    n_total = len(res["files"])
    assert n_total >= 16  # one file per non-empty bucket minimum

    # single-key lookup: result parity + opens exactly one bucket
    got = t.read_point(spark, [7])
    assert [(r["k"], r["v"]) for r in got.collect()] == [(7, "u7")]
    kb = t.key_buckets(spark, [7])
    assert kb is not None
    key_col, by_bucket = kb
    assert key_col == "k" and len(by_bucket) == 1
    bucket = next(iter(by_bucket))
    opened = {os.path.relpath(f.replace("file:", ""), t.root)
              for f in got.inputFiles()}
    assert opened == set(res["bucket_files"][bucket])
    assert len(opened) < n_total

    # deleted key: empty result, still bucket-bounded
    assert t.read_point(spark, [250]).count() == 0

    # multi-key lookup spans at most len(values) buckets
    vals = [1, 2, 3]
    got3 = t.read_point(spark, vals)
    assert sorted(r["k"] for r in got3.collect()) == vals
    kb3 = t.key_buckets(spark, vals)
    assert kb3 is not None and len(kb3[1]) <= 3
    opened3 = {os.path.relpath(f.replace("file:", ""), t.root)
               for f in got3.inputFiles()}
    allowed = {
        f for b in kb3[1] for f in res["bucket_files"].get(b, [])
    }
    assert opened3 <= allowed

    # parity with the full-scan filter on a sample
    full = {
        (r["k"], r["v"])
        for r in t.read(spark).filter(F.col("k").isin([1, 2, 3, 7])).collect()
    }
    point = {
        (r["k"], r["v"])
        for r in t.read_point(spark, [1, 2, 3, 7]).collect()
    }
    assert point == full

    # time travel: the pre-update version still serves the old row
    v0 = 0
    old = t.read_point(spark, [7], version=v0).collect()
    assert [(r["k"], r["v"]) for r in old] == [(7, "v7")]


def test_point_lookup_falls_back_on_unbucketed_versions(table):
    """Plain commits have no bucket layout: read_point falls back to a
    filtered full read (explicit key required — no cdc_key recorded)
    and returns identical rows. After a compact (unbucketed manifest),
    the CHAIN still carries cdc_key, and the fallback engages because
    the resolved snapshot has no bucket layout."""
    from anti_ddos_spark.sources.versioned import (
        compact,
        streaming_cdc_committer,
    )

    spark, t = table
    t.commit(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    with pytest.raises(ValueError, match="cdc_key"):
        t.read_point(spark, [1])
    got = t.read_point(spark, [1], key="k").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]

    sink = streaming_cdc_committer(t, "k", n_buckets=16)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I") for i in range(50)],
            "k long, v string, op string",
        ),
        0,
    )
    assert [(r["k"], r["v"]) for r in t.read_point(spark, [30]).collect()] \
        == [(30, "v30")]
    compact(t, spark, n_files=2)
    # unbucketed compact: fallback path, cdc_key from the chain
    assert t.key_buckets(spark, [30]) is None
    assert [(r["k"], r["v"]) for r in t.read_point(spark, [30]).collect()] \
        == [(30, "v30")]


def test_compact_buckets_is_bucket_local_and_layout_preserving(table):
    """Bucket-LOCAL compaction on a copy-on-write table: the COW
    committer leaves one file per bucket, so the automatic target set
    is empty (no-op, no version published) — the explicit ``buckets=``
    form rewrites exactly the pinned buckets, carries every other
    bucket verbatim, preserves the layout (the next CDC batch stays on
    a pruned DELTA manifest), is row-silent in the change feed, and
    point lookups keep working. (The stack-folding workload lives in
    tests/test_mor.py.)"""
    from anti_ddos_spark.sources.cdf import version_changes
    from anti_ddos_spark.sources.versioned import (
        compact_buckets,
        streaming_cdc_committer,
    )

    spark, t = table
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(200)],
            "k long, v string, op string, seq long",
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(3, "u3", "U", 1000), (11, "u11", "U", 1001)],
            "k long, v string, op string, seq long",
        ),
        1,
    )
    pre = t.current_version()
    res_pre = t._resolved(pre)
    snapshot_pre = sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    )

    # COW tables have one file per bucket: automatic targeting no-ops
    assert compact_buckets(t, spark) is None
    assert t.current_version() == pre

    pick = sorted(res_pre["bucket_files"])[:2]
    post = compact_buckets(t, spark, buckets=pick)
    assert post is not None and post > pre
    res_post = t._resolved(post)
    for b, fs in res_post["bucket_files"].items():
        if b in pick:
            assert len(fs) == 1 and fs != res_pre["bucket_files"][b]
        else:
            assert fs == res_pre["bucket_files"][b], b
    # layout metadata survives
    m = t._manifest(post)
    assert m["n_buckets"] == 8 and m["cdc_key"] == "k"
    # rows identical
    assert sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    ) == snapshot_pre
    # row-silent in the change feed (version_changes is inclusive of
    # from_version, so diff the compact version alone)
    assert version_changes(spark, t, "k", post, post).count() == 0
    # point lookup still bucket-bounded
    got = t.read_point(spark, [3])
    assert [(r["k"], r["v"]) for r in got.collect()] == [(3, "u3")]

    # the NEXT CDC batch stays on the pruned path: a delta manifest,
    # not a full re-bucketing merge
    sink(
        spark.createDataFrame(
            [(3, "w3", "U", 99999)], "k long, v string, op string, seq long"
        ),
        7,
    )
    m2 = t._manifest(t.current_version())
    assert "delta" in m2, "CDC after compact_buckets must stay pruned"
    assert len(m2["delta"]["touched"]) == 1


def test_compact_buckets_preserves_evolved_column_across_generations(table):
    """Round-12 ADVICE medium: compact_buckets' stack-free branch must
    read targets with the chain-recorded schema. Compacting a mix of
    pre- and post-evolution buckets previously let Spark infer the
    narrow footer and rewrite the evolved column away — stamped
    row_preserving, so the feed planned zero partitions and the loss
    was invisible. Pin: the evolved value survives a compaction that
    targets one wide and one narrow bucket, and the publish-time guard
    exists (rewritten columns == recorded schema)."""
    from anti_ddos_spark.sources.versioned import (
        compact_buckets,
        streaming_cdc_committer,
    )

    spark, t = table
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(20)],
            "k long, v string, op string, seq long",
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(3, "u3", 99, "U", 100)],
            "k long, v string, extra long, op string, seq long",
        ),
        1,
    )
    buckets = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(i,) for i in range(20)], "k long")
        .select(
            "k",
            F.pmod(F.xxhash64(F.col("k")), F.lit(8)).cast("int").alias("b"),
        )
        .collect()
    }
    other_b = next(b for k, b in buckets.items() if b != buckets[3])
    pre = t.current_version()
    post = compact_buckets(t, spark, buckets=[buckets[3], other_b])
    assert post is not None and post > pre
    snap = t.read(spark)
    assert snap.columns == ["k", "v", "extra"]
    rows = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
    assert rows[3] == ("u3", 99)  # survived the mixed-generation fold
    assert len(rows) == 20
    # compaction is row-preserving: byte-identical to the pre-compact
    # snapshot
    before = {
        r["k"]: (r["v"], r["extra"])
        for r in t.read(spark, version=pre).collect()
    }
    assert rows == before
