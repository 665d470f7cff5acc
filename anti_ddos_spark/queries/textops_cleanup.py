"""Text cleanup & decontamination queries: winnowing fingerprints,
benchmark decontamination, PII redaction, HTML boilerplate strip,
overlapping-window chunking.

Split out of queries/textops.py in round 6 (verdict task #5); see the
façade note in textops_prep.py - registry order is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from anti_ddos_spark.operators.text import word_ngrams
from anti_ddos_spark.queries.base import Query, _W, t

EXTRA_QUERIES: dict[str, Query] = {}


# --- q56: winnowing fingerprints (Schleimer et al., SIGMOD 2003) ----------

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # window of consecutive k-gram hashes


def q56_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing document fingerprints: hash every char k-gram, slide a
    w-window over the hash sequence, keep each window's minimum — the
    MOSS scheme, guaranteeing any shared substring of length ≥ k+w-1
    contributes a shared fingerprint. Entirely per-row higher-order
    expressions (zero shuffle, like q49); the fingerprint SET crosses
    the oracle boundary as count/min/max/sum so row width stays flat.
    At 100 TB the follow-on is an explode + groupBy(fp) candidate join —
    the same shape as q35's banded MinHash."""
    text = F.col("text")
    k, w = WINNOW_K, WINNOW_W
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text) - (k - 1)),
        lambda i: text.substr(i, F.lit(k)),
    )
    d = (
        t(spark, sf, "documents")
        .select("doc_id", "text")
        .withColumn(
            "_h",
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast(
                    "long"
                ),
            ),
        )
        .withColumn(
            "_mins",
            F.transform(
                F.sequence(F.lit(1), F.size("_h") - (w - 1)),
                lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
            ),
        )
        .withColumn("_fps", F.array_sort(F.array_distinct(F.col("_mins"))))
    )
    return d.select(
        "doc_id",
        F.size("_fps").alias("n_fps"),
        F.element_at("_fps", 1).alias("fp_min"),
        F.element_at("_fps", -1).alias("fp_max"),
        F.aggregate(
            "_fps", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("fp_sum"),
    )


Q56_SQL = f"""
WITH g AS (
  SELECT doc_id,
         [('0x' || substr(md5(substr(text, i, {WINNOW_K})), 1, 8))::BIGINT
          FOR i IN generate_series(1, length(text) - {WINNOW_K - 1})] AS h
  FROM documents),
m AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [list_min(list_slice(h, j, j + {WINNOW_W - 1}))
            FOR j IN generate_series(1, len(h) - {WINNOW_W - 1})])) AS fps
  FROM g)
SELECT doc_id, CAST(len(fps) AS INT) AS n_fps,
       fps[1] AS fp_min, fps[-1] AS fp_max,
       CAST(list_sum(fps) AS BIGINT) AS fp_sum
FROM m
"""

EXTRA_QUERIES["q56_winnow_fingerprints"] = Query(
    q56_winnow_fingerprints,
    Q56_SQL,
    "winnowing k-gram fingerprints (MOSS; zero-shuffle per-row folds)",
)


# --- q57: benchmark decontamination (eval n-gram overlap) -----------------

DECONTAM_N = 3  # word n-gram length; production decontamination uses 8-13,
#                 the demo corpus' ~30-word vocabulary needs 3 for density


def q57_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Training-set decontamination: flag training documents sharing any
    word n-gram with a held-out benchmark set (here: doc_id % 100 == 0
    plays the benchmark), reporting how many distinct eval n-grams each
    contaminated doc matches. The standard pre-training hygiene pass
    (n-gram overlap decontamination as in GPT-3 App. C / Dodge et al.
    2021).

    Scale shape: the eval gram set is benchmark-sized (thousands of
    docs), so it BROADCASTS; the train side streams through an
    explode → broadcast-hash semi-ish join → per-doc count. No
    all-pairs, no big-side shuffle except the final per-doc aggregate
    on the (rare) contaminated subset."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ws")
    )
    grams = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("ws"), DECONTAM_N)).alias("g")
    )
    is_eval = F.col("doc_id") % 100 == 0
    eval_grams = (
        grams.filter(is_eval).select(F.col("g").alias("eg")).distinct()
    )
    return (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), F.col("g") == F.col("eg"))
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("int").alias("n_hits"))
    )


Q57_SQL = f"""
WITH w AS (SELECT doc_id, {{_W}} AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) >= {DECONTAM_N}
         THEN [{{gram}} FOR i IN generate_series(1, len(ws) - {DECONTAM_N - 1})]
         ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM w),
e AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 = 0)
SELECT t.doc_id, CAST(count(DISTINCT t.g) AS INT) AS n_hits
FROM g t JOIN e USING (g)
WHERE t.doc_id % 100 <> 0
GROUP BY t.doc_id
""".format(
    _W=_W,
    gram=" || ' ' || ".join(f"ws[i+{k}]" for k in range(DECONTAM_N)),
)

EXTRA_QUERIES["q57_decontaminate"] = Query(
    q57_decontaminate,
    Q57_SQL,
    "benchmark decontamination: eval n-gram overlap flags "
    "(broadcast eval grams, no all-pairs)",
)


# --- q59: PII redaction profile (pre-release privacy pass) ----------------

def pii_enriched_text() -> "F.Column":
    """The synthetic documents contain no PII, so each doc is suffixed
    with an email, a NANP phone, and an IPv4 derived purely from its own
    columns — Q59_SQL builds the identical string, and the streaming
    twin (streamops q78) reuses this exact expression."""
    return F.concat_ws(
        "",
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com call "),
        (F.col("doc_id") % 800 + 100).cast("string"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from "),
        (F.col("doc_id") % 223 + 1).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 254 + 1).cast("string"),
    )


def pii_profile(d: DataFrame) -> DataFrame:
    """doc_id + per-class counts + redacted length/hash for a frame that
    already carries the enriched `_dirty` column."""
    from anti_ddos_spark.operators.text import pii_counts, redact_pii

    c = pii_counts(F.col("_dirty"))
    red = redact_pii(F.col("_dirty"))
    return d.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_phones"].alias("n_phones"),
        c["n_ipv4"].alias("n_ipv4"),
        F.length(red).cast("int").alias("red_len"),
        F.md5(red).alias("red_md5"),
    )


def q59_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over a deterministically-enriched corpus (see
    pii_enriched_text): the engine counts and redacts each class
    (operators/text.py::redact_pii). The whole op is a regexp
    projection — zero shuffle, whole-stage codegen, a free rider on any
    100 TB scan."""
    return pii_profile(
        t(spark, sf, "documents").withColumn("_dirty", pii_enriched_text())
    )


Q59_SQL = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com call '
              || (doc_id % 800 + 100) || '-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from ' || (doc_id % 223 + 1) || '.0.'
              || (doc_id % 256) || '.' || (doc_id % 254 + 1) AS dirty
  FROM documents),
r AS (
  SELECT doc_id, dirty,
         regexp_replace(regexp_replace(regexp_replace(dirty,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
  FROM d)
SELECT doc_id,
  CAST(len(regexp_extract_all(dirty,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(dirty, '\b\d{3}-\d{3}-\d{4}\b')) AS INT)
    AS n_phones,
  CAST(len(regexp_extract_all(dirty,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
  CAST(length(red) AS INT) AS red_len,
  md5(red) AS red_md5
FROM r
"""

EXTRA_QUERIES["q59_pii_redaction"] = Query(
    q59_pii_redaction,
    Q59_SQL,
    "PII redaction (email/phone/IPv4 regex scrub; zero-shuffle "
    "regexp projection)",
)


# --- q65: HTML boilerplate strip ------------------------------------------

def q65_html_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Markup removal over deterministically HTML-wrapped documents
    (tags + a sprinkling of entities built from the doc's own columns in
    both engines): strip tags, unescape entities, collapse whitespace
    (operators/text.py::strip_html). Zero-shuffle regexp projection —
    the standard first stage of a web-corpus curation funnel."""
    from anti_ddos_spark.operators.text import HTML_TAG_RE, strip_html

    html = F.concat_ws(
        "",
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit(" #"),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>"),
        F.upper(F.col("source")),
        F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit(" the "), F.lit(" &amp; ")),
        F.lit("</p><br/></body></html>"),
    )
    d = t(spark, sf, "documents").withColumn("_html", html)
    clean = strip_html(F.col("_html"))
    return d.select(
        "doc_id",
        F.regexp_count(F.col("_html"), F.lit(HTML_TAG_RE))
        .cast("int")
        .alias("n_tags"),
        F.length("_html").cast("int").alias("raw_len"),
        F.length(clean).cast("int").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


Q65_SQL = r"""
WITH d AS (
  SELECT doc_id,
         '<html><head><title>' || source || ' #' || doc_id
         || '</title></head><body><h1>' || upper(source) || '</h1><p>'
         || replace(text, ' the ', ' &amp; ')
         || '</p><br/></body></html>' AS html
  FROM documents),
s AS (
  SELECT doc_id, html,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(html, '<[^>]*>', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&amp;', '&'),
           '\s+', ' ', 'g')) AS clean
  FROM d)
SELECT doc_id,
  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
  CAST(length(html) AS INT) AS raw_len,
  CAST(length(clean) AS INT) AS clean_len,
  md5(clean) AS clean_md5
FROM s
"""

EXTRA_QUERIES["q65_html_strip"] = Query(
    q65_html_strip,
    Q65_SQL,
    "HTML boilerplate strip (tag removal + entity unescape + "
    "whitespace collapse)",
)


# --- q66: overlapping-window document chunking ----------------------------

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def q66_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking for retrieval/embedding indexing: each
    doc's token stream is cut into 64-token windows every 48 tokens
    (operators/text.py::chunk_documents). Per-row sequence + explode —
    chunks never cross partitions, so the op scales linearly with no
    shuffle at 100 TB."""
    from anti_ddos_spark.operators.text import chunk_documents

    return chunk_documents(
        t(spark, sf, "documents"), window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    )


def _chunk_grid_sql(window: int, stride: int) -> str:
    """Shared DuckDB CTE chain (w → c → e): filtered words + chunk grid,
    mirroring operators/text.py::chunk_documents exactly — including
    the empty-token filter and blank-doc drop. Q66 and Q68 both build
    on this so the grid arithmetic has ONE SQL-side definition."""
    return f"""
w AS (SELECT doc_id, list_filter({_W}, x -> x <> '') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) <= {window} THEN 1
              ELSE 1 + (len(ws) - {window} + {stride - 1})
                       // {stride} END AS n_chunks
  FROM w WHERE len(ws) > 0),
e AS (SELECT doc_id, ws, unnest(range(n_chunks)) AS i FROM c)"""


Q66_SQL = f"""
WITH {_chunk_grid_sql(CHUNK_WINDOW, CHUNK_STRIDE)}
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(i * {CHUNK_STRIDE} + 1 AS INT) AS tok_start,
       CAST(len(list_slice(ws, i * {CHUNK_STRIDE} + 1,
                           i * {CHUNK_STRIDE} + {CHUNK_WINDOW})) AS INT)
         AS n_toks,
       md5(array_to_string(list_slice(ws, i * {CHUNK_STRIDE} + 1,
                                      i * {CHUNK_STRIDE} + {CHUNK_WINDOW}),
                           ' ')) AS chunk_md5
FROM e
"""

EXTRA_QUERIES["q66_doc_chunks"] = Query(
    q66_doc_chunks,
    Q66_SQL,
    "overlapping context-window chunking (per-row sequence+explode, "
    "no shuffle)",
)


