"""Cross-query consistency: independent queries that measure the same
underlying quantity must agree. Each oracle pins one query against
DuckDB; these pin queries against EACH OTHER, so a semantics drift that
updates a query and its oracle together still trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE as SF
from anti_ddos_spark.queries import full_registry

REG = full_registry()


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return REG[name].fn(spark, SF)

    return run


def test_dedup_counts_agree_across_queries(q):
    """q30's corpus dedup summary vs q80's per-source funnel: the number
    of unique documents must match."""
    q30 = q("q30_exact_dedup").head()
    q80 = q("q80_curation_pipeline").agg(F.sum("n_uniq")).head()[0]
    assert q30["n_unique"] == q80
    assert q30["n_docs"] == q("q31_doc_profile").count()


def test_span_accounting_agrees_with_chunk_grid(q):
    """q68's span counts are exactly the 16/16 chunk grid row counts."""
    from anti_ddos_spark.operators.text import chunk_documents

    spans_total = q("q68_window_dedup").agg(F.sum("n_spans")).head()[0]
    # independent recomputation through the operator API
    import anti_ddos_spark.queries.base as b

    spark = q("q68_window_dedup").sparkSession
    grid = chunk_documents(b.t(spark, SF, "documents"), window=16, stride=16)
    assert grid.count() == spans_total


def test_token_mass_agrees_between_profile_and_datacard(q):
    """q31's per-doc BPE counts must sum to q58's per-source totals."""
    prof = q("q31_doc_profile").agg(F.sum("n_bpe_tokens")).head()[0]
    card = q("q58_corpus_datacard").agg(F.sum("total_tokens")).head()[0]
    assert prof == card


def test_sampling_budgets_hold(q):
    """q106 emits at most K rows per source and its key values are a
    subset of q89's corpus-wide keys for shared docs."""
    from anti_ddos_spark.queries.textops import STRAT_SAMPLE_K

    per_src = (
        q("q106_stratified_weighted_sample")
        .groupBy("source")
        .count()
        .agg(F.max("count"))
        .head()[0]
    )
    assert per_src <= STRAT_SAMPLE_K
    # shared doc -> identical E-S key in both queries
    j = (
        q("q89_weighted_sample")
        .select("doc_id", F.col("key_x1e9").alias("k_global"))
        .join(
            q("q106_stratified_weighted_sample").select(
                "doc_id", F.col("key_x1e9").alias("k_strat")
            ),
            "doc_id",
        )
    )
    assert j.filter(F.col("k_global") != F.col("k_strat")).count() == 0


def test_rate_monitors_agree(q):
    """Batch q87 and streaming q88 must produce identical z-score rows
    (they already share rate_zscores; this pins the input side too)."""
    a = q("q87_rate_anomaly")
    b_ = q("q88_streaming_rate_anomaly")
    assert a.count() == b_.count()
    assert a.exceptAll(b_).count() == 0


def test_bounded_dedup_replay_accounting(q):
    """q114's emitted set is fully determined by q30's digest summary:
    every distinct digest is emitted exactly twice (batch-0 first copy +
    batch-3 re-admission) plus the two clock rows."""
    q30 = q("q30_exact_dedup").head()
    out = q("q114_bounded_dedup_replay")
    assert out.count() == 2 * q30["n_unique"] + 2
    per = out.groupBy("digest").count()
    clocks = per.filter(F.col("digest").startswith("CLOCK-"))
    assert clocks.count() == 2
    assert per.filter(~F.col("digest").startswith("CLOCK-")).agg(
        F.min("count"), F.max("count")
    ).head() == (2, 2)


def test_stream_scoring_agrees_with_batch_rule(q):
    """q115's streamed labels == thresholding q24's batch flow features
    under the same append-emission predicate (stream ≡ batch, and the
    rule is applied identically by two code paths)."""
    from anti_ddos_spark.queries.streamops import (
        RULE_MIN_BYTES,
        RULE_MIN_PACKETS,
    )
    from anti_ddos_spark.queries.flow import FLOW_GAP_S
    from anti_ddos_spark.queries.base import t as _t

    streamed = q("q115_streaming_scored_flows").select("flow_id", "label")
    flows = q("q24_flow_features_full")
    final_wm = (
        _t(streamed.sparkSession, SF, "events")
        .agg(F.max(F.unix_micros("ts")))
        .head()[0]
    )
    from anti_ddos_spark.ml import volumetric_columns

    n_pkts, n_bytes = volumetric_columns()
    batch = flows.filter(
        F.col("last_ts_us") + FLOW_GAP_S * 1_000_000 < final_wm
    ).select(
        "flow_id",
        F.when(
            (n_pkts >= RULE_MIN_PACKETS) | (n_bytes >= RULE_MIN_BYTES),
            "DDoS",
        )
        .otherwise("Normal")
        .alias("label"),
    )
    a = {(r["flow_id"], r["label"]) for r in streamed.collect()}
    b = {(r["flow_id"], r["label"]) for r in batch.collect()}
    assert a == b and a


def test_ntile_quartiles_partition_the_corpus(q):
    """q91's equi-depth bins: counts sum to the corpus, sizes differ by
    at most one, and length spans are ordered and non-overlapping."""
    rows = sorted(q("q91_length_quartiles").collect(), key=lambda r: r["q"])
    n_docs = q("q31_doc_profile").count()
    assert [r["q"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == n_docs
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo["len_max"] <= hi["len_min"]
