"""BPE-ish pretokenizer count: definition checks + Spark↔DuckDB regex
parity on adversarial strings (the engines run different regex dialects —
Java vs RE2 — and q31's oracle only exercises the plain word corpus)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from anti_ddos_spark.operators.text import BPE_PRETOKEN_RE, token_counts

CASES = [
    "don't stop",          # contraction splits: don | 't | <sp>stop
    "it's 42 degrees!!",   # digits and punctuation runs
    "hello   world",       # multi-space run collapses to one ws token + ' world'
    "a1b2",                # alternating letter/digit runs
    "...",                 # punctuation only
    "word",                # single token
]


def _spark_counts(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i: long, text: string")
    rows = df.select("i", token_counts(F.col("text"))["n_bpe_tokens"].alias("n")).collect()
    return {r["i"]: r["n"] for r in rows}


def test_pretokenizer_counts(spark):
    got = _spark_counts(spark)
    # hand-derived from the pattern (alternation order matters: the
    # contraction branch wins before the letter branch)
    want = {
        0: 3,  # don | 't | ␣stop
        3: 4,  # a | 1 | b | 2
        4: 1,  # ...
        5: 1,  # word
    }
    for i, n in want.items():
        assert got[i] == n, (i, CASES[i], got[i])


def test_spark_duckdb_pretokenizer_parity(spark):
    got = _spark_counts(spark)
    con = duckdb.connect()
    sql_pat = BPE_PRETOKEN_RE.replace("'", "''")
    for i, t in enumerate(CASES):
        txt = t.replace("'", "''")
        (n,) = con.execute(
            f"SELECT len(regexp_extract_all('{txt}', '{sql_pat}'))"
        ).fetchone()
        assert got[i] == n, (t, got[i], n)
