"""Streaming change-data-feed reader (r9 verdict task #6): a REAL
readStream over the version chain, hash-checked against the relational
batch reconstruction of the same interval."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.sources.cdf import (
    register_cdf_source,
    version_changes,
)
from anti_ddos_spark.sources.versioned import (
    VersionedTable,
    streaming_cdc_committer,
)


SCHEMA = "k long, v string, op string, seq long"


def _build_table(spark, root: str) -> VersionedTable:
    """Four committed versions: seed inserts, a two-bucket update
    batch, a delete+insert batch, a single-key update."""
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(40)], SCHEMA
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(3, "u3", "U", 100), (17, "u17", "U", 101)], SCHEMA
        ),
        1,
    )
    sink(
        spark.createDataFrame(
            [(5, None, "D", 200), (99, "v99", "I", 201)], SCHEMA
        ),
        2,
    )
    sink(spark.createDataFrame([(17, "w17", "U", 300)], SCHEMA), 3)
    return t


def _canon(rows) -> list[tuple]:
    return sorted(
        (r["k"], r["v"], r["_op"], r["_version"]) for r in rows
    )


def _run_stream(spark, root: str, start_version: int, expect: int):
    register_cdf_source(spark)
    name = f"cdf_{abs(hash(root)) % 10**8}"
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", start_version)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    deadline = time.time() + 30
    while time.time() < deadline:
        rows = spark.table(name).collect()
        if len(rows) >= expect:
            return rows
        time.sleep(0.5)
    return spark.table(name).collect()


def test_streaming_cdf_replays_committed_versions(spark, tmp_path):
    """Replay from the seed: the stream's change rows equal the batch
    reconstruction of versions 0..3 — ops, payloads and version stamps
    all hash-identical."""
    root = str(tmp_path / "tbl")
    t = _build_table(spark, root)
    assert t.current_version() == 3

    want = _canon(
        version_changes(spark, t, "k", 0, 3)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    # 40 seed inserts + 2 updates + (1 delete + 1 insert) + 1 update
    assert len(want) == 45

    got = _canon(_run_stream(spark, root, start_version=-1, expect=45))
    assert got == want

    # spot-check the semantics, not just self-consistency
    by_key = [(r[0], r[2], r[3]) for r in got]
    assert (5, "D", 2) in by_key and (99, "I", 2) in by_key
    assert (17, "U", 1) in by_key and (17, "U", 3) in by_key
    assert sum(1 for r in got if r[2] == "I" and r[3] == 0) == 40


def test_streaming_cdf_from_midpoint_and_unchanged_rows_silent(
    spark, tmp_path
):
    """start_version=1 delivers only versions 2 and 3; rewritten-but-
    unchanged rows in a touched bucket emit nothing."""
    root = str(tmp_path / "tbl2")
    t = _build_table(spark, root)
    want = _canon(
        version_changes(spark, t, "k", 2, 3)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert len(want) == 3  # D5, I99, U17 — nothing else
    got = _canon(_run_stream(spark, root, start_version=1, expect=3))
    assert got == want
    # bucket 16-hash of k=5's bucket also held other keys whose rows
    # were rewritten verbatim by the merge — none of them appear
    assert all(r[2] in ("D", "I", "U") for r in got)


def test_cdf_partition_planning_is_bucket_bounded(spark, tmp_path):
    """A single-key commit plans exactly the touched buckets' diff
    partitions (the manifest names them) — never a table scan."""
    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader
    from pyspark.sql.types import StructType

    root = str(tmp_path / "tbl3")
    t = _build_table(spark, root)
    schema = StructType.fromJson(
        t._manifest(t.current_version())["schema"]
    )
    from pyspark.sql.types import LongType, StringType, StructField

    full = StructType(
        list(schema.fields)
        + [StructField("_op", StringType()), StructField("_version", LongType())]
    )
    r = VersionedCdfStreamReader(
        full, {"root": root, "key": "k", "start_version": "2"}
    )
    parts = r.partitions({"version": 2}, {"version": 3})
    # version 3 touched exactly one bucket (single-key update)
    assert len(parts) == 1
    assert parts[0].version == 3
    assert parts[0].old_files and parts[0].new_files
    # and the seed plans one partition per non-empty bucket, not one
    # giant scan
    seed_parts = r.partitions({"version": -1}, {"version": 0})
    assert len(seed_parts) > 4
    assert all(not p.old_files for p in seed_parts)


def test_cdf_update_preimage_supports_incremental_maintenance(
    spark, tmp_path
):
    """update_preimage=true emits retraction pairs (U- old row, U+ new
    row) — the form downstream incremental view maintenance needs.
    Proof: folding the feed (I and U+ add a row, D and U- remove one)
    in version order reconstructs the live snapshot EXACTLY."""
    root = str(tmp_path / "tblp")
    t = _build_table(spark, root)
    register_cdf_source(spark)
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .option("update_preimage", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_pre")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    rows = spark.table("cdf_pre").collect()
    # 40 I + (U- U+)x2 + (D + I) + (U- U+) = 48
    assert len(rows) == 48
    ops = {r["_op"] for r in rows}
    assert ops == {"I", "D", "U-", "U+"}
    # U- carries the OLD payload, U+ the new (k=17 updated twice)
    u17 = sorted(
        (r["_version"], r["_op"], r["v"])
        for r in rows
        if r["k"] == 17 and r["_op"].startswith("U")
    )
    assert u17 == [
        (1, "U+", "u17"), (1, "U-", "v17"),
        (3, "U+", "w17"), (3, "U-", "u17"),
    ]
    # incremental maintenance: fold the feed → the live snapshot
    # (retractions apply before additions within a version)
    order = {"U-": 0, "D": 0, "I": 1, "U+": 1}
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["_version"], order[r["_op"]])):
        if r["_op"] in ("I", "U+"):
            state[r["k"]] = r["v"]
        elif r["_op"] == "D":
            state.pop(r["k"], None)
        else:  # U-: retract, and verify it matches what was there
            assert state.pop(r["k"]) == r["v"]
    live = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert state == live
    # the batch twin emits the SAME retraction rows
    twin = _canon(
        version_changes(spark, t, "k", 0, 3, update_preimage=True)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert twin == _canon(rows)
    spark.catalog.dropTempView("cdf_pre")


def test_cdf_max_versions_per_batch_bounds_each_trigger(spark, tmp_path):
    """Backlog admission control in the LIVE-TAILING steady state: a
    capped (max_versions_per_batch=1) continuous query catches up with
    the seed, then three versions committed WHILE IT RUNS drain one
    version per micro-batch — bounded transactions. (The first batch of
    an incarnation is uncapped by design: the Python source API cannot
    see the checkpoint offset before its first latestOffset, and
    capping against a guess can regress the WAL — see the restart
    test.)"""
    root = str(tmp_path / "tblc")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(40)], SCHEMA
        ),
        0,
    )
    register_cdf_source(spark)
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .option("max_versions_per_batch", 1)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_capped")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while (
            time.time() < deadline
            and spark.table("cdf_capped").count() < 40
        ):
            time.sleep(1)
        # the consumer is caught up; now a 3-version backlog lands
        sink(
            spark.createDataFrame(
                [(3, "u3", "U", 100), (17, "u17", "U", 101)], SCHEMA
            ),
            1,
        )
        sink(
            spark.createDataFrame(
                [(5, None, "D", 200), (99, "v99", "I", 201)], SCHEMA
            ),
            2,
        )
        sink(spark.createDataFrame([(17, "w17", "U", 300)], SCHEMA), 3)
        deadline = time.time() + 120
        while (
            time.time() < deadline
            and spark.table("cdf_capped").count() < 45
        ):
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    rows = spark.table("cdf_capped").collect()
    assert len(rows) == 45
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"]]
    # the backlog drained one version per non-empty batch: after the
    # catch-up batches, the tail must be the per-version sizes 2, 2, 1
    # (never a single 5-row batch swallowing versions 1-3)
    assert sizes[0] == 40
    assert [s for s in sizes[1:] if s] == [2, 2, 1]
    assert _canon(rows) == _canon(
        version_changes(spark, t, "k", 0, 3)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    spark.catalog.dropTempView("cdf_capped")


def test_cdf_max_version_pins_bounded_replay_across_runs(spark, tmp_path):
    """``max_version`` pins each run's END at a fixed version — the
    restart-safe way to consume a chain one known slice at a time:
    four availableNow runs sharing one checkpoint, run *i* pinned at
    chain version *i*, each deliver exactly that version's changes and
    the union equals the full replay."""
    root = str(tmp_path / "tblmv")
    t = _build_table(spark, root)
    register_cdf_source(spark)
    chain: list[int] = []
    v = t.current_version()
    while v is not None:
        chain.append(v)
        v = t._manifest(v)["base"]
    chain.reverse()
    ckpt = str(tmp_path / "ckpt_mv")
    out = str(tmp_path / "out_mv")
    per_run = []
    seen = 0
    for end_v in chain:
        q = (
            spark.readStream.format("versioned_cdf")
            .option("root", root)
            .option("key", "k")
            .option("start_version", -1)
            .option("max_version", str(end_v))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        rows = spark.read.parquet(out).collect()
        new = [r for r in rows if r["_version"] > (chain[len(per_run) - 1] if per_run else -1)]
        per_run.append(new)
        seen = len(rows)
    assert seen == 45
    assert [len(r) for r in per_run] == [40, 2, 2, 1]
    for rows, end_v in zip(per_run, chain):
        assert {r["_version"] for r in rows} == {end_v}
    got = _canon([r for rows in per_run for r in rows])
    want = _canon(
        version_changes(spark, t, "k", 0, 3)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert got == want


def test_cdf_capped_reader_restart_never_regresses_offsets(spark, tmp_path):
    """A RESTARTED capped reader (Spark skips initialOffset when the
    checkpoint already has offsets) must not cap latestOffset against
    its configured start_version: that would hand Spark a version OLDER
    than the checkpoint offset, regress the WAL and re-deliver versions
    (duplicate changes — fatal for IVM consumers). A fresh incarnation
    drains its backlog uncapped; the cap re-engages once the
    incarnation has a planned/committed baseline."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader

    root = str(tmp_path / "tblrs")
    t = _build_table(spark, root)
    schema = StructType.fromJson(t._manifest(t.current_version())["schema"])
    full = StructType(
        list(schema.fields)
        + [
            StructField("_op", StringType()),
            StructField("_version", LongType()),
        ]
    )
    opts = {
        "root": root,
        "key": "k",
        "start_version": "-1",
        "max_versions_per_batch": "1",
    }
    # fresh-checkpoint incarnation: initialOffset establishes the
    # baseline, so the cap engages from the first batch
    r1 = VersionedCdfStreamReader(full, dict(opts))
    assert r1.initialOffset() == {"version": -1}
    assert r1.latestOffset() == {"version": 0}
    # restarted incarnation: no initialOffset call; the checkpoint
    # offset (2) is unknown to the reader — latestOffset must return
    # the live head, not start_version's capped successor (0)
    r2 = VersionedCdfStreamReader(full, dict(opts))
    assert r2.latestOffset() == {"version": 3}
    parts = r2.partitions({"version": 2}, {"version": 3})
    assert all(p.version == 3 for p in parts)
    # with a baseline established, the cap re-engages and never regresses
    r2.commit({"version": 3})
    assert r2.latestOffset() == {"version": 3}
    # an end behind the start fails loudly instead of regressing the WAL
    with pytest.raises(ValueError, match="behind the checkpoint"):
        r2.partitions({"version": 3}, {"version": 1})


def test_cdf_over_append_sink_is_batch_bounded_and_keeps_duplicates(
    spark, tmp_path
):
    """An append-sink table's changes are exactly the appended files —
    the reader plans ONE insert partition per version reading NO old
    files (falling through to a table diff would be O(table) per
    batch), and append rows are FACTS: repeated keys must all survive
    (the keyed diff would collapse them)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        foreach_batch_committer,
    )

    root = str(tmp_path / "tbla")
    t = VersionedTable(root)
    sink = foreach_batch_committer(t)
    # batch 1 repeats k=1 twice; batch 2 repeats it again
    sink(
        spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], "k long, v string"
        ),
        0,
    )
    sink(spark.createDataFrame([(1, "c")], "k long, v string"), 1)
    sink(spark.createDataFrame([(3, "d"), (3, "d")], "k long, v string"), 2)

    rows = _run_stream(spark, root, start_version=-1, expect=6)
    got = sorted((r["k"], r["v"], r["_op"], r["_version"]) for r in rows)
    assert got == [
        (1, "a", "I", 0), (1, "a", "I", 0), (1, "c", "I", 1),
        (2, "b", "I", 0), (3, "d", "I", 2), (3, "d", "I", 2),
    ]

    # planning: each append version is one partition with NO old files
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType()),
         StructField("_op", StringType()), StructField("_version", LongType())]
    )
    r = VersionedCdfStreamReader(
        schema, {"root": root, "key": "k", "start_version": "0"}
    )
    parts = r.partitions({"version": 0}, {"version": 2})
    assert len(parts) == 2
    assert all(not p.old_files and p.new_files for p in parts)


def test_cdf_rebucket_version_plans_residue_partitions(
    spark, tmp_path, monkeypatch
):
    """A layout-growth (re-bucket) version must NOT plan one
    whole-table diff partition: power-of-two layouts co-locate keys by
    residue mod min(old_n, new_n), so the reader plans g parallel
    partitions — and the replayed changes still hash-match the batch
    twin across the re-bucket."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from anti_ddos_spark.sources import versioned as V
    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        streaming_cdc_committer,
    )

    monkeypatch.setattr(V, "CDC_TARGET_ROWS_PER_BUCKET", 1)
    root = str(tmp_path / "tblr")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq")  # policy mode
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(20)], SCHEMA
        ),
        0,
    )
    old_n = t._manifest(t.current_version())["n_buckets"]
    # grow 5x past the 4x threshold, then the next batch re-buckets
    sink(
        spark.createDataFrame(
            [(i, "b", "I", 1000 + i) for i in range(20, 700)], SCHEMA
        ),
        1,
    )
    sink(spark.createDataFrame([(3, "z", "U", 9999)], SCHEMA), 2)
    m = t._manifest(t.current_version())
    new_n = m["n_buckets"]
    assert new_n > old_n and "files" in m  # the re-bucketing FULL commit

    sch = StructType.fromJson(m["schema"])
    full = StructType(
        list(sch.fields)
        + [StructField("_op", StringType()), StructField("_version", LongType())]
    )
    r = VersionedCdfStreamReader(
        full, {"root": root, "key": "k", "start_version": "1"}
    )
    parts = r.partitions({"version": 1}, {"version": 2})
    # residue planning: g = old_n partitions, never one table-wide diff
    assert len(parts) == old_n
    assert all(p.old_files and p.new_files for p in parts)

    # and the replayed content is right across the re-bucket
    want = _canon(
        version_changes(spark, t, "k", 2, 2)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert [w[:3] for w in want] == [(3, "z", "U")]
    got = _canon(_run_stream(spark, root, start_version=1, expect=1))
    assert got == want


def test_cdf_compact_is_row_silent_and_rebucket_falls_back(spark, tmp_path):
    """A row-preserving compact emits zero changes (r11: by planned
    silence — the committer flags the version and the reader plans no
    partition at all); the stream keeps going across it."""
    from anti_ddos_spark.sources.versioned import compact

    root = str(tmp_path / "tbl4")
    t = _build_table(spark, root)
    compact(t, spark, n_files=2)
    v_compact = t.current_version()
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=16)
    sink(spark.createDataFrame([(7, "z7", "U", 400)], SCHEMA), 4)

    want = _canon(
        version_changes(spark, t, "k", v_compact, t.current_version())
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert [w[:3] for w in want] == [(7, "z7", "U")]
    got = _canon(_run_stream(spark, root, start_version=3, expect=1))
    assert got == want


def test_cdf_residue_planning_covers_every_file_exactly_once(tmp_path):
    """Pure-planner property: for power-of-two layout changes, the
    residue partitions cover every old file and every new file exactly
    once (completeness + disjointness — with key co-location by the
    hash-mod-g argument, this is the correctness of the re-bucket
    replay). No Spark, no data: planning reads only manifests."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader
    from anti_ddos_spark.sources.versioned import VersionedTable

    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType()),
         StructField("_op", StringType()), StructField("_version", LongType())]
    )
    for old_n, new_n in ((16, 64), (64, 16), (32, 32_768 // 512), (16, 4096)):
        root = str(tmp_path / f"t_{old_n}_{new_n}")
        t = VersionedTable(root)
        old_bf = {
            str(b): [f"data/d-old/b{b}-{j}.parquet" for j in range(1 + b % 3)]
            for b in range(old_n)
            if b % 5 != 1  # holes: some buckets empty
        }
        new_bf = {
            str(b): [f"data/d-new/b{b}.parquet"]
            for b in range(new_n)
            if b % 7 != 2
        }
        t._publish(
            [f for b in sorted(old_bf) for f in old_bf[b]], "overwrite",
            None, extra={"bucket_files": old_bf, "n_buckets": old_n},
        )
        t._publish(
            [f for b in sorted(new_bf) for f in new_bf[b]], "overwrite",
            0, extra={"bucket_files": new_bf, "n_buckets": new_n},
        )
        r = VersionedCdfStreamReader(
            schema, {"root": root, "key": "k", "start_version": "0"}
        )
        parts = r.partitions({"version": 0}, {"version": 1})
        g = min(old_n, new_n)
        assert len(parts) <= g
        old_seen = [f for p in parts for f in p.old_files]
        new_seen = [f for p in parts for f in p.new_files]
        want_old = sorted(
            f"{root}/{f}" for fs in old_bf.values() for f in fs
        )
        want_new = sorted(f"{root}/{f}" for fs in new_bf.values() for f in fs)
        assert sorted(old_seen) == want_old  # exactly once each
        assert sorted(new_seen) == want_new


def test_cdf_seed_replay_after_vacuum_rerooted_mor_table(spark, tmp_path):
    """r10 ADVICE (high): vacuum re-roots the oldest kept manifest of a
    merge-on-read table WITH its delta stacks preserved — a replay from
    -1 must emit the STACK-REPLAYED seed state as inserts, not the
    stale base rows (which would resurrect deleted keys and drop every
    stack row)."""
    from anti_ddos_spark.sources.versioned import vacuum

    root = str(tmp_path / "mor")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(60)], SCHEMA
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(7, "u7a", "U", 1), (23, None, "D", 2), (41, "u41", "U", 3)],
            SCHEMA,
        ),
        1,
    )
    sink(
        spark.createDataFrame(
            [(7, "u7b", "U", 1), (23, "w23", "I", 2), (55, None, "D", 3)],
            SCHEMA,
        ),
        2,
    )
    vacuum(t, keep_versions=1, min_age_s=0)
    v = t.current_version()
    res = t._resolved(v)
    assert t._manifest(v)["base"] is None  # re-rooted
    assert any(res["bucket_deltas"].values())  # ...with live stacks

    snap = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert len(snap) == 59  # 60 inserts, 55 deleted

    got = _run_stream(spark, root, start_version=-1, expect=len(snap))
    assert all(r["_op"] == "I" for r in got)
    assert sorted((r["k"], r["v"]) for r in got) == snap
    by = {r["k"]: r["v"] for r in got}
    assert by[7] == "u7b" and by[23] == "w23" and by[41] == "u41"
    assert 55 not in by


def test_cdf_max_version_not_on_chain_fails_loudly(spark, tmp_path):
    """r10 ADVICE: a max_version that is not a committed version of the
    chain (vacuumed away, orphan, never existed) must raise a clear
    ValueError naming the option, not a raw manifest FileNotFoundError
    from inside planning."""
    from anti_ddos_spark.sources.cdf import (
        VersionedCdfStreamReader,
        _table_schema,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from anti_ddos_spark.sources.versioned import vacuum

    root = str(tmp_path / "tbl")
    t = _build_table(spark, root)  # versions 0..3
    vacuum(t, keep_versions=2, min_age_s=0)  # 0 and 1 are gone

    base = _table_schema(root)
    schema = StructType(
        list(base.fields)
        + [
            StructField("_op", StringType(), False),
            StructField("_version", LongType(), False),
        ]
    )
    r = VersionedCdfStreamReader(
        schema,
        {"root": root, "key": "k", "start_version": "-1", "max_version": "0"},
    )
    with pytest.raises(ValueError, match="max_version 0 is not a"):
        r.latestOffset()


def test_cdf_row_preserving_versions_plan_zero_partitions(spark, tmp_path):
    """r10 verdict task #3: an OPTIMIZE (compact / Z-order / bucket
    stack fold) declares row_preserving in its manifest and the feed
    planner plans ZERO input partitions for it — no whole-table diff
    to prove silence — while the feed's rows across the version are
    unchanged."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from anti_ddos_spark.sources.cdf import VersionedCdfStreamReader
    from anti_ddos_spark.sources.versioned import compact, compact_buckets

    root = str(tmp_path / "tbl")
    t = _build_table(spark, root)
    v_before = t.current_version()

    # whole-table OPTIMIZE-ZORDER
    compact(t, spark, n_files=2, zorder_cols=["k"])
    v_z = t.current_version()
    assert t._manifest(v_z)["row_preserving"] is True

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("_op", StringType()),
            StructField("_version", LongType()),
        ]
    )
    r = VersionedCdfStreamReader(
        schema, {"root": root, "key": "k", "start_version": str(v_before)}
    )
    assert r._version_partitions(v_z) == []
    # the batch twin skips it too (version_changes is INCLUSIVE of
    # from_version, so v_before's own row appears — the silent compact
    # version contributes nothing)
    vc = version_changes(spark, t, "k", v_before, v_z)
    assert vc.filter(F.col("_version") == v_z).count() == 0

    # and a MOR bucket compaction (stack fold) is equally silent
    root2 = str(tmp_path / "mor")
    t2 = VersionedTable(root2)
    sink = streaming_cdc_committer(
        t2, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(30)], SCHEMA
        ),
        0,
    )
    sink(spark.createDataFrame([(3, "u3", "U", 1)], SCHEMA), 1)
    v_fold = compact_buckets(t2, spark, max_files_per_bucket=1)
    assert t2._manifest(v_fold)["row_preserving"] is True
    r2 = VersionedCdfStreamReader(
        schema, {"root": root2, "key": "k", "start_version": "-1"}
    )
    assert r2._version_partitions(v_fold) == []

    # feed across the silent version == feed up to it (hash-unchanged)
    upto = _canon(
        version_changes(spark, t2, "k", 0, t2.current_version() - 1)
        .select("k", "v", "_op", "_version")
        .collect()
    )
    across = _canon(
        version_changes(spark, t2, "k", 0, t2.current_version())
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert across == upto and len(upto) == 31


def test_cdf_chunked_diff_parity_with_whole_bucket(spark, tmp_path):
    """r10 verdict task #4: a diff partition whose bytes exceed the
    disk budget chunks the keyed diff by key-hash residue class. With
    budget=1 (maximal chunking: one chunk per on-disk byte bucket) the
    emitted rows must be IDENTICAL to the whole-bucket diff — on a
    merge-on-read table so the chunked stack replay is covered too."""
    from anti_ddos_spark.sources.cdf import _diff_rows

    root = str(tmp_path / "mor")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(
        t, "k", seq_col="seq", n_buckets=8, merge_on_read=True
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(200)], SCHEMA
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(7, "u7", "U", 1), (23, None, "D", 2), (151, "u151", "U", 3)],
            SCHEMA,
        ),
        1,
    )
    sink(
        spark.createDataFrame(
            [(7, "w7", "U", 1), (61, None, "D", 2)], SCHEMA
        ),
        2,
    )

    from anti_ddos_spark.sources.cdf import (
        VersionedCdfStreamReader,
        _table_schema,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        list(_table_schema(root).fields)
        + [
            StructField("_op", StringType(), False),
            StructField("_version", LongType(), False),
        ]
    )
    r = VersionedCdfStreamReader(
        schema, {"root": root, "key": "k", "start_version": "-1"}
    )
    parts = r.partitions(
        {"version": -1}, {"version": t.current_version()}
    )
    assert parts  # seed buckets + two MOR delta versions

    whole = sorted(row for p in parts for row in _diff_rows(p))
    for p in parts:
        p.disk_budget = 4096  # a few KB per pass: every partition chunks
    chunked = sorted(row for p in parts for row in _diff_rows(p))
    assert chunked == whole
    assert len(whole) == 200 + 3 + 2

    # and the option plumbs through a REAL stream: tiny budget, same feed
    register_cdf_source(spark)
    q = (
        spark.readStream.format("versioned_cdf")
        .option("root", root)
        .option("key", "k")
        .option("start_version", -1)
        .option("diff_disk_budget_bytes", 4096)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_budget")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    got = _canon(spark.table("cdf_budget").collect())
    want = _canon(
        version_changes(spark, t, "k", 0, t.current_version())
        .select("k", "v", "_op", "_version")
        .collect()
    )
    assert got == want
    spark.catalog.dropTempView("cdf_budget")


def test_cdf_and_read_survive_additive_schema_evolution(spark, tmp_path):
    """Round 11: a CDC batch that ADDS a column evolves the table
    additively end-to-end — the committer records the UNION schema
    (and a later narrow batch must not shrink it), apply_cdc
    null-fills instead of dropping, the snapshot read serves the
    recorded schema over mixed-generation buckets, and both feed
    consumers emit the evolved column with NULL for rows that predate
    it. Time travel to a pre-evolution version keeps its own schema."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(20)], SCHEMA
        ),
        0,
    )
    wide = "k long, v string, extra long, op string, seq long"
    sink(spark.createDataFrame([(3, "u3", 99, "U", 1)], wide), 1)
    sink(spark.createDataFrame([(5, "u5", "U", 1)], SCHEMA), 2)

    snap = t.read(spark)
    assert snap.columns == ["k", "v", "extra"]
    rows = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
    assert rows[3] == ("u3", 99)
    assert rows[5] == ("u5", None) and rows[0] == ("v0", None)
    assert len(rows) == 20
    # time travel: the pre-evolution version serves its own schema
    assert t.read(spark, version=0).columns == ["k", "v"]

    want = sorted(
        (r["k"], r["v"], r["extra"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    assert (3, "u3", 99, "U", 1) in want
    assert (3, "v3", None, "I", 0) in want
    assert (5, "u5", None, "U", 2) in want

    got = _run_stream(spark, root, start_version=-1, expect=22)
    assert sorted(
        (r["k"], r["v"], r["extra"], r["_op"], r["_version"]) for r in got
    ) == want


def test_pruned_committer_preserves_evolved_column_across_generations(
    spark, tmp_path
):
    """Round-12 ADVICE high: the committer's pruned copy-on-write read
    must serve the chain-RECORDED schema. A narrow batch that touches
    both a post-evolution bucket (its files carry the evolved column)
    and a pre-evolution bucket (they don't) previously read the
    snapshot with whichever footer Spark inferred — inferring the
    narrow one silently dropped the evolved column and the rewrite made
    the loss permanent. Pin: the evolved value survives exactly such a
    batch, on both the snapshot and the change feed."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    sink = streaming_cdc_committer(t, "k", seq_col="seq", n_buckets=8)
    sink(
        spark.createDataFrame(
            [(i, f"v{i}", "I", i) for i in range(20)], SCHEMA
        ),
        0,
    )
    wide = "k long, v string, extra long, op string, seq long"
    sink(spark.createDataFrame([(3, "u3", 99, "U", 100)], wide), 1)

    # the committer's own routing expression names each key's bucket
    buckets = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(i,) for i in range(20)], "k long")
        .select(
            "k",
            F.pmod(F.xxhash64(F.col("k")), F.lit(8)).cast("int").alias("b"),
        )
        .collect()
    }
    same = next(k for k in range(20) if k != 3 and buckets[k] == buckets[3])
    other = next(k for k in range(20) if buckets[k] != buckets[3])

    # the regression batch: NARROW schema, one key in the wide bucket
    # (not key 3 — its evolved value must be carried, not rewritten)
    # and one in a narrow bucket → the pruned snapshot read spans both
    # generations
    sink(
        spark.createDataFrame(
            [(same, "usame", "U", 200), (other, "uother", "U", 201)],
            SCHEMA,
        ),
        2,
    )
    snap = t.read(spark)
    assert snap.columns == ["k", "v", "extra"]
    rows = {r["k"]: (r["v"], r["extra"]) for r in snap.collect()}
    assert rows[3] == ("u3", 99)  # survived the mixed-generation rewrite
    assert rows[same] == ("usame", None)
    assert rows[other] == ("uother", None)
    assert len(rows) == 20

    # the feed sees the same three updates, evolved column intact
    feed = sorted(
        (r["k"], r["v"], r["extra"], r["_op"], r["_version"])
        for r in version_changes(spark, t, "k", 0, t.current_version())
        .collect()
    )
    assert (3, "u3", 99, "U", 1) in feed
    assert (same, "usame", None, "U", 2) in feed
    assert (other, "uother", None, "U", 2) in feed

    # point lookup across generations serves the recorded schema too
    # (round-12 ADVICE medium: read_point's pruned branch was a bare
    # parquet read)
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in t.read_point(spark, [3, other]).collect()
    }
    assert got == {3: ("u3", 99), other: ("uother", None)}
