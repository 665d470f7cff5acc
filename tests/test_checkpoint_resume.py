"""Exactly-once across stream restarts: the checkpoint is the contract.

A file-source stream with a durable sink is stopped after processing the
first batch of files; new files arrive; the SAME query (same checkpoint)
restarts. Spark's file-source log + sink commit log must ensure the
second run processes ONLY the new files — every input row appears in the
output exactly once, no re-processing, no loss. This is the recovery
semantics a 100 TB ingest depends on after every executor/driver
failure."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from conftest import SF_DIR as SF  # env-overridable testdata root


def _run_once(spark, src, out, ckpt):
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(src)
    q = (
        stream.select("doc_id", F.length("text").alias("n"))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"


def test_restart_processes_only_new_files_exactly_once(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")

        first.coalesce(1).write.mode("append").parquet(src)
        _run_once(spark, src, out, ckpt)
        n1 = spark.read.parquet(out).count()
        assert n1 == first.count()

        # new data lands; SAME query restarts from the checkpoint
        second.coalesce(1).write.mode("append").parquet(src)
        _run_once(spark, src, out, ckpt)

        got = spark.read.parquet(out)
        assert got.count() == docs.count(), "rows lost or reprocessed"
        # exactly once: every doc_id appears once
        assert got.select("doc_id").distinct().count() == docs.count()

        # a third restart with NO new data is a no-op
        _run_once(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == docs.count()
