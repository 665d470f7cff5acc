"""Sequence-packing operator: known-answer spans + shard independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from anti_ddos_spark.operators.text import pack_sequences


def _pack(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, n_tokens INT")
    out = pack_sequences(df, budget=budget)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_known_spans(spark):
    # budget 10; stream: 4 | 10 | 14 | 1  → offsets 0, 4, 14, 28
    rows = [
        (1, "s", 4),   # tokens [0,4)   → seq 0 only
        (2, "s", 10),  # tokens [4,14)  → seqs 0-1 (straddles the cut at 10)
        (3, "s", 14),  # tokens [14,28) → seqs 1-2
        (4, "s", 1),   # tokens [28,29) → seq 2
    ]
    got = _pack(spark, rows, budget=10)
    assert (got[1]["seq_first"], got[1]["seq_last"], got[1]["n_seqs"]) == (0, 0, 1)
    assert (got[2]["seq_first"], got[2]["seq_last"], got[2]["n_seqs"]) == (0, 1, 2)
    assert (got[3]["seq_first"], got[3]["seq_last"], got[3]["n_seqs"]) == (1, 2, 2)
    assert (got[4]["seq_first"], got[4]["seq_last"], got[4]["n_seqs"]) == (2, 2, 1)
    assert got[3]["tok_start"] == 14


def test_zero_token_doc_stays_at_offset(spark):
    rows = [(1, "s", 10), (2, "s", 0), (3, "s", 5)]
    got = _pack(spark, rows, budget=10)
    # doc 2 sits exactly at the boundary (offset 10): seq 1, spans nothing
    assert (got[2]["seq_first"], got[2]["seq_last"], got[2]["n_seqs"]) == (1, 1, 1)
    assert got[3]["tok_start"] == 10  # zero-token doc consumes no budget


def test_shards_pack_independently(spark):
    rows = [(1, "a", 7), (2, "b", 7), (3, "a", 7), (4, "b", 7)]
    got = _pack(spark, rows, budget=10)
    # each shard starts its own stream at offset 0
    assert got[1]["tok_start"] == 0 and got[2]["tok_start"] == 0
    assert got[3]["tok_start"] == 7 and got[4]["tok_start"] == 7
    assert got[3]["n_seqs"] == 2  # [7,14) straddles 10


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 4}", 10 + i) for i in range(100)],
        "doc_id INT, source STRING, n_tokens INT",
    )
    plan = pack_sequences(df, 512)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
