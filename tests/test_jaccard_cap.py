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
    Zipfian real text the rare-first prefix keeps capped recall high."""
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
