"""Dynamic partition pruning: a selective dimension filter prunes the
fact table's partitions AT RUNTIME — the optimization that turns a
100 TB partitioned-fact join into a scan of only the partitions the dim
side selects. Pinned here on a hive-partitioned table because DPP needs
a partitioned scan + a join whose other side carries the filter."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.plans import plan_summary
from conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_corpus(spark):
    tmp = tempfile.mkdtemp(prefix="dpp_")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    path = os.path.join(tmp, "by_source")
    docs.write.partitionBy("source").parquet(path)
    return path


def test_dynamic_partition_pruning_fires(spark, partitioned_corpus):
    """Classic DPP shape: partitioned fact JOIN small dim ON the
    partition column, with a literal filter on the DIM side — the
    runtime subquery must land in the fact scan's PartitionFilters."""
    fact = spark.read.parquet(partitioned_corpus)
    sources = sorted(
        r["source"] for r in fact.select("source").distinct().collect()
    )
    assert len(sources) > 1  # pruning is meaningful
    dim = spark.createDataFrame(
        [(s, len(s)) for s in sources], "src string, meta int"
    ).filter(F.col("src") == sources[0])
    j = fact.join(dim, fact.source == dim.src).groupBy("source").count()
    s = plan_summary(j, execute=True)
    assert "dynamicpruningexpression" in s["text"], s["text"][:2000]
    assert "IN dynamicpruning" in s["text"], s["text"][:2000]


def test_static_partition_filter_prunes_scan(spark, partitioned_corpus):
    """The static baseline: a literal partition predicate must reach the
    scan as a PartitionFilter (no data files of other partitions read)."""
    fact = spark.read.parquet(partitioned_corpus)
    some = fact.select("source").head()["source"]
    s = plan_summary(fact.filter(F.col("source") == some).select("doc_id"))
    assert "PartitionFilters" in s["text"], s["text"][:1500]
    assert some in s["text"]
