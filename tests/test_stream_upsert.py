"""Streaming upsert: foreachBatch + dynamic partition overwrite.

The streaming form of sources/maintenance.py::upsert_partitions — each
micro-batch replaces exactly the partitions it carries, so a continuous
ingest refreshes a partitioned corpus without ever rewriting untouched
partitions (and replayed batches are idempotent: re-overwriting the
same partitions with the same rows converges, the exactly-once recipe
for partition-aligned sinks)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from conftest import SF_DIR


def _part_files(path, part):
    return sorted(
        (f, os.stat(f).st_ino)
        for f in glob.glob(os.path.join(path, f"source={part}", "*.parquet"))
    )


def test_foreach_batch_partition_upsert(spark):
    from anti_ddos_spark.sources.maintenance import upsert_partitions

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "source"
    )
    sources = sorted(r[0] for r in docs.select("source").distinct().collect())
    target, untouched = sources[0], sources[1]
    with tempfile.TemporaryDirectory() as tmp:
        table = os.path.join(tmp, "corpus")
        docs.write.partitionBy("source").parquet(table)
        before_untouched = _part_files(table, untouched)

        # stream carries ONLY the target partition's refresh
        src = os.path.join(tmp, "incoming")
        updates = docs.filter(F.col("source") == target).withColumn(
            "text", F.upper("text")
        )
        updates.coalesce(1).write.parquet(src)

        stream = spark.readStream.schema(
            "doc_id BIGINT, text STRING, source STRING"
        ).parquet(src)

        def upsert_batch(batch_df, batch_id):
            upsert_partitions(batch_df, table, "source")

        q = (
            stream.writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

        # untouched partition: same files, same inodes
        assert _part_files(table, untouched) == before_untouched
        back = spark.read.parquet(table)
        assert back.count() == docs.count()
        got = back.filter(F.col("source") == target)
        assert got.count() == updates.count()
        assert got.filter(F.col("text") != F.upper("text")).count() == 0
