"""write_training_shards: deterministic hash sharding + file caps."""

from __future__ import annotations

import glob
import os
import tempfile

from anti_ddos_spark.sources.sinks import write_training_shards

SF = "/root/testdata/sf0.001"


def test_shard_writer_roundtrip_and_layout(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n_in = docs.count()
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        manifest = write_training_shards(
            docs, out, n_shards=4, key_col="doc_id", max_records_per_file=10
        ).collect()
        # manifest covers every row exactly once
        assert sum(r["n_rows"] for r in manifest) == n_in
        assert sorted(r["shard"] for r in manifest) == sorted(
            {r["shard"] for r in manifest}
        )
        # layout: hive-style shard dirs; row cap respected per file
        shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
        assert len(shard_dirs) == len(manifest)
        for d in shard_dirs:
            files = glob.glob(os.path.join(d, "*.parquet"))
            assert files
            for f in files:
                assert spark.read.parquet(f).count() <= 10
        # roundtrip: nothing lost or duplicated, shard is recoverable
        back = spark.read.parquet(out)
        assert back.count() == n_in
        assert back.select("doc_id").distinct().count() == n_in


def test_shard_assignment_deterministic(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    with tempfile.TemporaryDirectory() as tmp:
        m1 = write_training_shards(
            docs, os.path.join(tmp, "a"), n_shards=4, key_col="doc_id"
        ).collect()
        m2 = write_training_shards(
            docs, os.path.join(tmp, "b"), n_shards=4, key_col="doc_id"
        ).collect()
        assert m1 == m2


def test_append_manifest_counts_only_this_write(spark):
    """mode='append': the manifest must describe THIS write's rows, not
    the accumulated table (the round-5 advice finding)."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        write_training_shards(half_a, out, n_shards=4, key_col="doc_id")
        m2 = write_training_shards(
            half_b, out, n_shards=4, key_col="doc_id", mode="append"
        ).collect()
        # manifest of the append covers exactly half_b, not the union
        assert sum(r["n_rows"] for r in m2) == half_b.count()
        # the table itself does hold the union
        assert spark.read.parquet(out).count() == docs.count()
