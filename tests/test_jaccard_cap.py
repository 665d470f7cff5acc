"""Capped-prefix posture of the n-gram Jaccard join (q34's operator).

The cap trades recall for a df-bounded candidate count (PERF.md
"token-space saturation"). Properties: capped output is a SUBSET of the
exact output, and on the fixture a moderate cap retains most pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_capped_subset_and_monotone(spark):
    """Subset + monotone convergence: capped pairs are always a subset
    of the exact pairs, a looser cap can only add pairs, and a cap
    no trigram reaches equals the exact output.

    Recall numbers on THIS fixture are deliberately not asserted high:
    the demo corpus is token-space-saturated (~30-word vocabulary), the
    regime where a df cap costs recall — measured here at ~33% with a
    10%-df cap (102/311), exactly the tradeoff PERF.md documents. On
    Zipfian text the trade is scale-conditional (round-7 planted-recall
    measurement): w=3 capped recall is 1.0 at 50k docs but ~0 at 500k
    (the char-trigram space itself saturates at |alphabet|³); w=5
    restores 0.98-0.999 — see PERF.md round-7 / scripts/zipf_recall.py."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    docs = t(spark, SF_DIR_ORACLE, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs))
    assert exact, "fixture must produce near-dup pairs"

    n_docs = docs.count()
    tight = _pairs(ngram_jaccard_pairs(docs, max_prefix_df=n_docs // 10))
    loose = _pairs(ngram_jaccard_pairs(docs, max_prefix_df=n_docs // 2))
    assert tight <= loose <= exact
    assert tight, "even a tight cap keeps the rarest-token pairs"
    # a cap above every df is a no-op → exact recall
    assert _pairs(ngram_jaccard_pairs(docs, max_prefix_df=n_docs)) == exact


def test_uncapped_is_default(spark):
    """A bare call (what q34, the oracle query, does) is the exact
    recall-1 form: identical to an explicit max_prefix_df=None."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    docs = t(spark, SF_DIR_ORACLE, "documents")
    assert _pairs(ngram_jaccard_pairs(docs)) == _pairs(
        ngram_jaccard_pairs(docs, max_prefix_df=None)
    )


def test_wider_ngram_is_exact_vs_bruteforce(spark):
    """ngram_w=5 (the round-6 de-saturation mode): the prefix-filtered
    join must still be RECALL 1 for the 5-gram Jaccard metric — equal to
    a brute-force within-block all-pairs computation."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import char_ngrams, ngram_jaccard_pairs

    docs = t(spark, SF_DIR_ORACLE, "documents")
    got = ngram_jaccard_pairs(docs, ngram_w=5)
    d = docs.select(
        "doc_id", "source", "lang",
        F.floor(F.col("n_chars") / 100).alias("band"),
        char_ngrams(5).alias("g"),
    )
    a, b = d.alias("a"), d.alias("b")
    jac = F.floor(
        F.size(F.array_intersect("a.g", "b.g")) * 100.0
        / F.size(F.array_union("a.g", "b.g"))
        + 0.5
    ).cast("int")
    brute = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("tri_jaccard_pct"),
        )
        .filter(F.col("tri_jaccard_pct") >= 30)
    )
    rows = lambda df: {  # noqa: E731
        (r["id_a"], r["id_b"], r["tri_jaccard_pct"]) for r in df.collect()
    }
    g, bf = rows(got), rows(brute)
    assert g == bf
    assert g, "fixture must produce 5-gram near-dup pairs"


def test_trigram_default_unchanged_by_width_param(spark):
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    docs = t(spark, SF_DIR_ORACLE, "documents")
    assert _pairs(ngram_jaccard_pairs(docs)) == _pairs(
        ngram_jaccard_pairs(docs, ngram_w=3)
    )
