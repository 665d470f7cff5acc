"""Planted-value units for the round-5 cleanup/chunking/projection ops:
PII redaction, HTML strip, overlapping chunking, signed random projection.
Oracle parity for each lives in test_queries_oracle.py (q59/q65/q66/q67);
these pin the exact per-row semantics on hand-built rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from anti_ddos_spark.operators.similarity import (
    random_projection,
    rp_sign_matrix,
)
from anti_ddos_spark.operators.text import (
    chunk_documents,
    pii_counts,
    redact_pii,
    strip_html,
)


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail john.doe+x@sub.example.co call 212-555-1234 from 8.8.8.8 ok"),
            (2, "no pii here, just words and 123 numbers"),
            (3, "two mails a@b.io c@d.org and ip 192.168.0.1"),
        ],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            c["n_emails"].alias("e"),
            c["n_phones"].alias("p"),
            c["n_ipv4"].alias("i"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"], rows[1]["i"]) == (1, 1, 1)
    assert rows[1]["red"] == "mail <EMAIL> call <PHONE> from <IP> ok"
    assert (rows[2]["e"], rows[2]["p"], rows[2]["i"]) == (0, 0, 0)
    assert rows[2]["red"] == "no pii here, just words and 123 numbers"  # untouched
    assert (rows[3]["e"], rows[3]["i"]) == (2, 1)
    assert rows[3]["red"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_strip_html_planted(spark):
    df = spark.createDataFrame(
        [(1, '<html><p class="x">a &amp; b</p>\n\t<div>c &lt;d&gt;</div></html>')],
        "id long, html string",
    )
    out = df.select(strip_html(F.col("html")).alias("clean")).head()["clean"]
    assert out == "a & b c <d>"


def test_strip_html_double_escaped_entities(spark):
    """&amp; decodes LAST: doubly-escaped '&amp;lt;b&amp;gt;' is HTML
    that *displays* the text '&lt;b&gt;' — it must decode to that
    literal, never re-form a '<b>' tag."""
    df = spark.createDataFrame(
        [(1, "<p>&amp;lt;b&amp;gt; and &amp;amp;</p>")], "id long, html string"
    )
    out = df.select(strip_html(F.col("html")).alias("c")).head()["c"]
    assert out == "&lt;b&gt; and &amp;"


def test_chunk_documents_blank_doc_emits_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, "one token here")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, window=4, stride=3).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["n_toks"] == 3


def test_chunk_documents_planted(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), (2, "a b")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, window=4, stride=3)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["tok_start"], r["n_toks"]) for r in out.collect())
    )
    # doc 1: 10 words -> 1 + ceil(6/3) = 3 chunks at starts 1, 4, 7
    # doc 2: 2 words -> single underfull chunk
    assert rows == [
        (1, 0, 1, 4),
        (1, 1, 4, 4),
        (1, 2, 7, 4),
        (2, 0, 1, 2),
    ]
    # every token covered: union of [start, start+n) spans 1..10
    covered = set()
    for _, _, start, n in rows[:3]:
        covered.update(range(start, start + n))
    assert covered == set(range(1, 11))


def test_chunk_documents_rejects_bad_grid(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, window=2, stride=4)


def test_rp_sign_matrix_deterministic_and_mixed():
    a = rp_sign_matrix(8, 64)
    assert a == rp_sign_matrix(8, 64)
    assert all(s in (-1, 1) for row in a for s in row)
    # md5 digits are uniform: every projection row must mix both signs
    assert all({-1, 1} == set(row) for row in a)


def test_random_projection_basis_vector(spark):
    dim, k = 4, 2
    signs = rp_sign_matrix(k, dim)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, -2.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in random_projection(df, k=k, dim=dim).collect()}
    for j in range(k):
        assert rows[0][f"p{j}"] == signs[j][0] * 1000
        assert rows[1][f"p{j}"] == signs[j][1] * -2000


def test_release_gate_blocks_contaminated_corpus(spark):
    """q113: n_contaminated participates in the release verdict — a
    corpus passing dup/PSI/OOV but containing benchmark-contaminated
    docs must NOT get release_ok=1 (round-5 advice, medium)."""
    from anti_ddos_spark.queries.textops import (
        RELEASE_MAX_CONTAMINATED,
        q113_release_gate,
    )

    row = q113_release_gate(spark, "/root/testdata/sf0.001").collect()[0]
    expected = (
        row["dup_bps"] <= 2000
        and row["psi_x1e6"] <= 250_000
        and row["oov_bps"] <= 100
        and row["n_contaminated"] <= RELEASE_MAX_CONTAMINATED
    )
    assert row["release_ok"] == int(expected)
    assert RELEASE_MAX_CONTAMINATED == 0
