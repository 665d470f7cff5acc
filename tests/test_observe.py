"""df.observe(): free metrics collected DURING execution — how a
production pipeline watches row counts / null rates / value bounds
without paying a second pass over 100 TB.

Runs in a FORKED session (spark.newSession()): Observation registers
execution listeners whose leftovers break closure serialization for
LATER RDD-based MLlib jobs in the same session state (reproduced:
test_pipeline's evaluator dies with 'Task not serializable' iff these
tests ran first on the shared session). Fork isolates the listener
state; same JVM, so still cheap.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Observation, functions as F

from conftest import SF_DIR


@pytest.fixture()
def ospark(spark):
    return spark.newSession()


def test_observe_collects_metrics_in_one_pass(ospark):
    docs = ospark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    obs = Observation("corpus_health")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        F.max("n_chars").alias("max_chars"),
    )
    # one action drives both the query and the metrics
    n = observed.count()
    got = obs.get
    assert got["rows"] == n
    assert got["null_texts"] == 0
    exact = docs.agg(F.max("n_chars")).head()[0]
    assert got["max_chars"] == exact


def test_observe_on_filtered_pipeline(ospark):
    """Metrics observe the frame WHERE the observe() sits — before later
    filters — so a pipeline can report pre-gate and post-gate counts
    from one run."""
    docs = ospark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pre = Observation("pre_gate")
    gated = (
        docs.observe(pre, F.count(F.lit(1)).alias("rows"))
        .filter(F.col("n_chars") > 200)
    )
    post = gated.count()
    assert pre.get["rows"] == docs.count()
    assert post < pre.get["rows"]
