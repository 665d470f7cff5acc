"""Property-based invariants for the round-5 text-cleanup operators.

Each hypothesis example builds one multi-row DataFrame (Spark round-trip
per example is ~seconds, so few examples, many rows per example):

- PII redaction is idempotent and leaves no matchable PII behind;
- chunking covers every token exactly within its grid and respects the
  chunk-count formula;
- HTML stripping leaves no tag-shaped substring.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from anti_ddos_spark.operators.text import (
    chunk_documents,
    redact_pii,
    strip_html,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.text(alphabet="abcdefg0189.-@<>&; ", min_size=1, max_size=12),
    min_size=1,
    max_size=30,
)
pii_bits = st.sampled_from(
    [
        "a.b@example.com",
        "x@y.io",
        "212-555-0000",
        "8.8.8.8",
        "10.255.0.1",
        "999-123-4567",
    ]
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(words, st.lists(pii_bits, max_size=3)), min_size=1, max_size=12))
def test_redact_pii_idempotent_and_complete(spark, docs):
    rows = [
        (i, " ".join(ws + pii)) for i, (ws, pii) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    once = redact_pii(F.col("text"))
    out = df.select(
        F.col("id"), once.alias("r1"), redact_pii(once).alias("r2")
    ).collect()
    for r in out:
        assert r["r1"] == r["r2"]  # idempotent
        # every planted PII token is gone as a standalone token
        for bit in docs[r["id"]][1]:
            assert f" {bit} " not in f" {r['r1']} ", (bit, r["r1"])


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=10),
    st.integers(1, 20),
    st.integers(0, 15),
)
def test_chunk_grid_covers_every_token(spark, doc_lens, stride, extra):
    window = stride + extra
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(doc_lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=window, stride=stride)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(doc_lens):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        expect = 1 if n <= window else 1 + -(-(n - window) // stride)
        assert len(chunks) == expect, (n, window, stride)
        covered = set()
        for c in chunks:
            assert c["tok_start"] == c["chunk_id"] * stride + 1
            assert 1 <= c["n_toks"] <= window
            covered.update(range(c["tok_start"], c["tok_start"] + c["n_toks"]))
        assert covered == set(range(1, n + 1)), (n, window, stride)


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="ab<>&;x/ \t\n\"'=p", max_size=60), min_size=1, max_size=12))
def test_strip_html_leaves_no_tags(spark, texts):
    rows = [(i, f"<div a='{1}'>" + t + "</div>") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, html string")
    for r in df.select(strip_html(F.col("html")).alias("c")).collect():
        assert not re.search(r"<[^>]*>", r["c"]), r["c"]
        # collapsed whitespace, trimmed
        assert "  " not in r["c"] and r["c"] == r["c"].strip()
