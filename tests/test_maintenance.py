"""Partition upsert (dynamic overwrite) and small-file compaction."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from anti_ddos_spark.sources.maintenance import (
    compact_partitions,
    upsert_partitions,
)

SF = "/root/testdata/sf0.001"


def _files(path, part):
    return sorted(
        (f, os.stat(f).st_ino)
        for f in glob.glob(os.path.join(path, f"source={part}", "*.parquet"))
    )


def test_upsert_touches_only_its_partitions(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    sources = [r[0] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    target, untouched = sources[0], sources[1]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "corpus")
        docs.write.partitionBy("source").parquet(path)
        before_untouched = _files(path, untouched)
        before_target = _files(path, target)

        updates = docs.filter(F.col("source") == target).withColumn(
            "text", F.upper("text")
        )
        n_updates = updates.count()
        upsert_partitions(updates, path, "source")

        # untouched partition: identical files, same inodes
        assert _files(path, untouched) == before_untouched
        # target partition: rewritten
        assert _files(path, target) != before_target
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        got = back.filter(F.col("source") == target)
        assert got.count() == n_updates
        # the update actually applied
        assert got.filter(F.col("text") != F.upper("text")).count() == 0


def test_compaction_respects_file_budget(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    with tempfile.TemporaryDirectory() as tmp:
        frag = os.path.join(tmp, "fragmented")
        dest = os.path.join(tmp, "compacted")
        # accrete many small files per partition
        docs.repartition(20).write.partitionBy("source").parquet(frag)
        some_part = docs.select("source").head()["source"]
        assert len(_files(frag, some_part)) > 3

        manifest = {
            r["source"]: r
            for r in compact_partitions(
                spark, frag, dest, "source", target_rows_per_file=40
            ).collect()
        }
        total = 0
        for part, row in manifest.items():
            files = _files(dest, part)
            # planned budget holds up to the maxRecordsPerFile backstop
            # (content-identical rows share a salt and may split); every
            # file respects the row target, and fragmentation shrank
            assert 1 <= len(files) <= max(
                row["n_files"], -(-row["n_rows"] // 40)
            ), (part, len(files), row)
            assert len(files) < len(_files(frag, part)), part
            for f, _ino in files:
                assert spark.read.parquet(f).count() <= 40
            total += row["n_rows"]
        assert total == docs.count()
        assert spark.read.parquet(dest).count() == docs.count()


def test_apply_cdc_row_classes_and_broadcast_plan(spark):
    """MERGE semantics row-by-row: kept rows intact, updates replace,
    inserts appear, deletes vanish — and the snapshot side never
    shuffles (broadcast anti-join on the change keys)."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.plans import plan_summary
    from anti_ddos_spark.sources.maintenance import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    ch = spark.createDataFrame(
        [(2, "B", 22.0, "U"), (4, "d", 40.0, "I"), (3, None, 0.0, "D")],
        "k long, v string, x double, op string",
    )
    out = apply_cdc(snap, ch, "k")
    got = {r["k"]: (r["v"], r["x"]) for r in out.collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 22.0), 4: ("d", 40.0)}

    s = plan_summary(out)
    assert s["n_broadcast_joins"] >= 1
    assert s["n_sortmerge_joins"] == 0
    assert s["n_shuffle_exchanges"] == 0


def test_apply_cdc_seq_resolution_and_malformed_ops(spark):
    """Ordered changelog semantics: with seq_col the LAST change per
    key wins (U then D deletes; I then U lands the update), and
    malformed/null ops are ignored entirely — they must not fall
    through as accidental deletes."""
    from anti_ddos_spark.sources.maintenance import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    ch = spark.createDataFrame(
        [
            (2, "B1", "U", 1),  # then deleted at seq 2 → must vanish
            (2, None, "D", 2),
            (4, "d0", "I", 1),  # then updated at seq 3 → d1 wins
            (4, "d1", "U", 3),
            (3, None, "x", 9),  # malformed op: MUST be a no-op
            (1, None, None, 9),  # null op: MUST be a no-op
        ],
        "k long, v string, op string, seq long",
    )
    out = apply_cdc(snap, ch, "k", seq_col="seq")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 3: "c", 4: "d1"}


def test_apply_cdc_tie_break_is_deterministic(spark):
    """Contract-violating batches (two change rows sharing (key, seq))
    must resolve to the SAME row on every run: the ordering key is
    (seq, op, payload hash), so repeated merges agree."""
    from anti_ddos_spark.sources.maintenance import apply_cdc

    snap = spark.createDataFrame([(1, "old")], "k long, v string")
    # same key, same seq, different payloads — a contract violation
    ch = spark.createDataFrame(
        [(1, "a", "U", 9), (1, "b", "U", 9), (1, "z", "U", 3)],
        "k long, v string, op string, seq long",
    )
    results = {
        tuple(sorted((r["k"], r["v"]) for r in
              apply_cdc(snap, ch, "k", seq_col="seq").collect()))
        for _ in range(5)
    }
    assert len(results) == 1  # stable across runs
    ((k, v),) = results.pop()
    assert k == 1 and v in ("a", "b")  # seq 9 wins; tie is pinned
