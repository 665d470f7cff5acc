"""Parquet schema evolution: mergeSchema reads across drifted file
generations — the read-side half of the q107 union-by-name story."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_merge_schema_reads_both_generations(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "feed")
        # generation 1: no quality column
        docs.select("doc_id", "text").write.parquet(
            os.path.join(path, "gen=1")
        )
        # generation 2: adds a quality column
        docs.select(
            "doc_id", "text", F.length("text").alias("quality")
        ).write.parquet(os.path.join(path, "gen=2"))

        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"doc_id", "text", "quality", "gen"}
        n = docs.count()
        assert merged.count() == 2 * n
        # old generation rows surface with NULL quality
        assert merged.filter(F.col("quality").isNull()).count() == n
        assert (
            merged.filter((F.col("gen") == 2) & F.col("quality").isNotNull())
            .count()
            == n
        )


def test_without_merge_schema_first_footer_wins(spark):
    """The default read takes one footer's schema — documenting WHY
    mergeSchema matters for drifted feeds."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "feed")
        docs.select("doc_id").write.parquet(os.path.join(path, "gen=1"))
        docs.select("doc_id", F.length("text").alias("extra")).write.parquet(
            os.path.join(path, "gen=2")
        )
        plain = spark.read.parquet(path)
        # whichever footer was sampled, the merged union of columns is
        # NOT guaranteed without mergeSchema
        assert set(plain.columns) <= {"doc_id", "extra", "gen"}
