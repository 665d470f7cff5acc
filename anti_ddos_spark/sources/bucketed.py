"""Bucketed-table layout: pre-shuffled co-located joins.

The single biggest repeated-cost lever at 100 TB: a fact table that is
joined on the same key every night should pay its shuffle ONCE, at write
time. ``bucketBy(N, key)`` persists parquet pre-hash-partitioned (and,
with ``sortBy``, pre-sorted) on the join key; every later join between
two tables bucketed on the same key with the same bucket count is
planned as a SortMergeJoin with NO Exchange on either side — proved in
``tests/test_bucketed.py``.

Spark specifics encoded here:

- bucketed output requires the table catalog (``saveAsTable``); a plain
  ``.parquet(path)`` write silently drops the bucket spec,
- bucket count is the parallelism floor for bucket-preserving reads —
  at 100 TB pick it near the cluster's target partition count (e.g.
  2048), not a toy number,
- one file per bucket per write task: ``repartition(key)`` first so each
  bucket is written contiguously (many small files per bucket otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and per-bucket sorted)
    on ``key``. With ``path`` the table is external (data survives a
    DROP TABLE)."""
    w = (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. When both
    sides share (key, bucket count) the plan contains no Exchange — the
    shuffle was paid at write time."""
    return spark.table(left).join(spark.table(right), key, how)
