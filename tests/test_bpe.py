"""BPE learn/apply vs a pure-Python reference implementation of the
public algorithm (Sennrich et al. 2016), plus cross-engine SQL parity
and the zero-shuffle plan pin for the apply path."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anti_ddos_spark.operators.bpe import (
    bpe_learn,
    bpe_sql_tokens,
    tokens_expr,
    word_histogram,
)
from anti_ddos_spark.plans import plan_summary


# --- reference implementation (textbook algorithm, driver-side) ----------


def ref_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping pass — the convention both
    the Spark fold and the reference's pairwise scan implement."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def ref_learn(
    word_counts: dict[str, int], num_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best_n = max(stats.values())
        if best_n < min_count:
            break
        a, b = min(p for p, n in stats.items() if n == best_n)
        merges.append((a, b))
        vocab = {
            tuple(ref_merge_word(list(s), a, b)): c for s, c in vocab.items()
        }
    return merges


def ref_tokenize(text: str, merges: list[tuple[str, str]]) -> list[str]:
    import re

    out: list[str] = []
    for w in re.split("[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            syms = ref_merge_word(syms, a, b)
        out.extend(syms)
    return out


def spark_hist(spark, words: dict[str, int]):
    rows = [(w, c) for w, c in sorted(words.items())]
    return spark.createDataFrame(rows, "word string, cnt long")


# --- learn parity ---------------------------------------------------------


def test_learn_matches_reference_fixed_corpus(spark):
    words = {
        "low": 5, "lower": 2, "lowest": 6, "newer": 6, "new": 2,
        "wider": 3, "widest": 1,
    }
    got = bpe_learn(spark_hist(spark, words), num_merges=8)
    assert got == ref_learn(words, 8)
    # sanity: real multi-char subwords were learned
    assert any(len(a + b) >= 3 for a, b in got)


def test_learn_stops_below_min_count(spark):
    words = {"ab": 1, "cd": 1}
    assert bpe_learn(spark_hist(spark, words), num_merges=4, min_count=2) == []


def test_overlap_resolves_left_first(spark):
    # "aaa" under (a,a): one left-to-right pass gives [aa, a], and the
    # pair count for the argmax weighs overlapping positions (2 per
    # "aaa"), matching the reference get_stats convention.
    words = {"aaa": 3}
    got = bpe_learn(spark_hist(spark, words), num_merges=2)
    assert got == ref_learn(words, 2)
    assert got[0] == ("a", "a")


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc01", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    )
)
def test_learn_matches_reference_hypothesis(spark, words):
    assert bpe_learn(spark_hist(spark, words), num_merges=5) == ref_learn(
        words, 5
    )


# --- apply parity (Spark fold ≡ reference ≡ generated DuckDB SQL) --------


TEXTS = [
    "Hello, lowly world!",
    "abab ababa aaab",
    "the lowest newer widest 0x42 --- ",
    "",
    "  ,,  ",
    "aaa",
]
MERGES = [("a", "b"), ("ab", "a"), ("l", "o"), ("lo", "w"), ("e", "r")]


def test_tokens_match_reference_and_sql(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = [
        r["toks"]
        for r in df.select(tokens_expr(F.col("text"), MERGES).alias("toks"))
        .collect()
    ]
    want = [ref_tokenize(t, MERGES) for t in TEXTS]
    assert got == want

    con = duckdb.connect()
    expr = bpe_sql_tokens("t", MERGES)
    for t, w in zip(TEXTS, want):
        (d,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [t]
        ).fetchone()
        assert d == w, t
    con.close()


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet="ab l0!", max_size=30))
def test_tokens_concat_invariant_hypothesis(spark, text):
    """Tokens of each word concatenate back to the word (merges never
    lose or duplicate characters), for arbitrary text."""
    import re

    toks = ref_tokenize(text, MERGES)
    words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
    assert "".join(toks) == "".join(words)


def test_apply_plan_is_zero_shuffle(spark):
    import pyspark.sql.functions as F

    df = spark.range(8).select(
        F.concat(F.lit("abab lowly x"), F.col("id").cast("string")).alias(
            "text"
        )
    )
    s = plan_summary(df.select(tokens_expr(F.col("text"), MERGES)))
    assert s["n_shuffle_exchanges"] == 0
    assert s["n_broadcast_exchanges"] == 0


def test_vocab_join_apply_matches_fold_apply(spark):
    """The V-bounded apply twin reproduces the zero-shuffle fold form
    exactly — including per-document token ORDER (positional
    re-assembly) — in both broadcast and shuffle-join modes."""
    from anti_ddos_spark.operators.bpe import bpe_tokenize, bpe_tokenize_via_vocab

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string"
    )
    want = {
        r["id"]: r["bpe_tokens"] for r in bpe_tokenize(df, MERGES).collect()
    }
    for bc in (True, False):
        got = {
            r["id"]: r["bpe_tokens"]
            for r in bpe_tokenize_via_vocab(df, MERGES, broadcast_vocab=bc)
            .collect()
        }
        # row-for-row faithful, INCLUDING docs with zero alphanumeric
        # words (re-joined with an empty token array)
        assert got == want, bc
