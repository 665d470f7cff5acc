"""Planted-value checks for the Gopher-style repetition metrics
(operators/text.py word_ngrams / top_ngram_count / repetition_metrics).
The oracle query (q49, full_registry) proves cross-engine parity; these
prove the metric DEFINITIONS against hand-computed fixtures.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from anti_ddos_spark.operators.text import (
    repetition_metrics,
    top_ngram_count,
    word_ngrams,
)

CASES = [
    # (text, n_words, top_bigram_frac, dup_trigram_frac)
    ("a a a a", 4, 3 / 3, 1 / 2),          # bigrams: 3x "a a"; trigrams: 2x "a a a" → 1 dup of 2
    ("x y z w", 4, 1 / 3, 0.0),            # all ngrams unique
    ("spam ham spam ham spam", 5, 2 / 4, 1 / 3),  # "spam ham" twice; "spam ham spam" twice
    ("one", 1, 0.0, 0.0),                  # too short for any ngram
    ("two words", 2, 1 / 1, 0.0),          # one bigram, no trigram
]


@pytest.fixture(scope="module")
def metrics_df(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_ ) in enumerate(CASES)], "doc_id: long, text: string"
    )
    df = (
        df.withColumn("_ws", F.split(F.trim("text"), r"\s+"))
        .withColumn("_bg", word_ngrams(F.col("_ws"), 2))
        .withColumn("_tg", word_ngrams(F.col("_ws"), 3))
    )
    m = repetition_metrics(F.col("_bg"), F.col("_tg"))
    rows = df.select(
        "doc_id",
        F.size("_ws").alias("n_words"),
        m["top_bigram_frac"].alias("tbf"),
        m["dup_trigram_frac"].alias("dtf"),
    ).collect()
    return {r["doc_id"]: r for r in rows}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_planted_repetition_values(metrics_df, i):
    _text, n_words, tbf, dtf = CASES[i]
    r = metrics_df[i]
    assert r["n_words"] == n_words
    assert r["tbf"] == pytest.approx(tbf)
    assert r["dtf"] == pytest.approx(dtf)


def test_top_ngram_count_is_max_frequency(spark):
    df = spark.createDataFrame(
        [(["b c", "a b", "b c", "a b", "b c"],)], "g: array<string>"
    )
    assert df.select(top_ngram_count(F.col("g")).alias("c")).first()["c"] == 3
    empty = spark.createDataFrame([([],)], "g: array<string>")
    assert empty.select(top_ngram_count(F.col("g")).alias("c")).first()["c"] == 0
