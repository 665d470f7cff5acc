"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Training-data-pipeline extensions (no analogue
in the reference) — all Catalyst-native expressions, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from anti_ddos_spark.operators.dedup import minhash_signature, words

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ein", "ist"),
    "es": ("el", "los", "las", "una", "y", "en"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}
LANG_ORDER = ["de", "en", "es", "fr", "zh"]  # deterministic tie-break order


def _marker_hits(ws: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*markers)))


def lang_scores(text: Column, ws: Column | None = None) -> list[Column]:
    ws = words(text) if ws is None else ws
    return [_marker_hits(ws, LANG_MARKERS[lang]).alias(f"score_{lang}") for lang in LANG_ORDER]


def predict_lang() -> Column:
    """argmax over score columns, first-in-order wins ties, 'und' if 0."""
    best = None
    best_lang = F.lit("und")
    for lang in LANG_ORDER:
        s = F.col(f"score_{lang}")
        if best is None:
            best, best_lang = s, F.when(s > 0, lang).otherwise("und")
        else:
            improved = s > best
            best_lang = F.when(improved & (s > 0), F.lit(lang)).otherwise(best_lang)
            best = F.when(improved, s).otherwise(best)
    return best_lang


def text_stats(text: Column, ws: Column | None = None) -> dict[str, Column]:
    """Deterministic quality features over one text column.

    Pass ``ws`` as a MATERIALIZED words column when calling repeatedly —
    every use of an inline words(text) re-runs the regex split (no CSE
    across expression copies or higher-order lambdas)."""
    ws = words(text) if ws is None else ws
    n_words = F.size(ws)
    n_chars = F.length(text)
    distinct_ratio_pct = F.floor(
        F.size(F.array_distinct(ws)) * 100.0 / n_words + 0.5
    ).cast("int")
    mean_word_len_x10 = F.floor(
        (n_chars - (n_words - 1)) * 10.0 / n_words + 0.5
    ).cast("int")  # chars minus separators per word, ×10 fixed-point
    long_word_pct = F.floor(
        F.size(F.filter(ws, lambda w: F.length(w) >= 7)) * 100.0 / n_words + 0.5
    ).cast("int")
    return {
        "n_words": n_words.cast("int"),
        "n_chars_calc": n_chars.cast("int"),
        "distinct_ratio_pct": distinct_ratio_pct,
        "mean_word_len_x10": mean_word_len_x10,
        "long_word_pct": long_word_pct,
    }


def quality_score() -> Column:
    """0-100 composite from text_stats columns (already materialized)."""
    score = (
        F.least(F.col("n_words"), F.lit(100))
        + F.col("distinct_ratio_pct") / 2
        - F.when(F.col("mean_word_len_x10") < 30, 20).otherwise(0)
    )
    return F.greatest(F.least(F.floor(score).cast("int"), F.lit(100)), F.lit(0))


def fingerprint(text: Column, ws: Column | None = None) -> Column:
    """Document fingerprint: first MinHash value (stable content id for
    near-dup clustering); exact-dup id is md5(text).

    With ``ws`` given, the shingle lambda runs over the materialized
    column (the inline form re-splits per element — the q31 hot cost)."""
    if ws is None:
        return minhash_signature(text, k=1)[0]
    from anti_ddos_spark.operators.dedup import shingles_of_words

    sh = shingles_of_words(ws, text)
    return F.array_min(
        F.transform(sh, lambda x: F.md5(F.concat_ws(":", F.lit("0"), x)))
    )


# GPT-2-style pretokenizer, minus the trailing-space lookahead (RE2 — the
# DuckDB oracle's engine — has no lookahead; on space-separated corpora
# the two patterns count identically): contractions, space-prefixed
# letter/digit runs, space-prefixed punctuation runs, whitespace runs.
# Matches are what a BPE vocabulary would merge within — counting them
# approximates tokenizer load without shipping a vocab.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts(text: Column, ws: Column | None = None) -> dict[str, Column]:
    """BPE-ish token accounting via regex classes."""
    ws = words(text) if ws is None else ws
    return {
        "n_alpha_tokens": F.regexp_count(text, F.lit(r"[a-z]+")).cast("int"),
        "n_num_tokens": F.regexp_count(text, F.lit(r"[0-9]+")).cast("int"),
        "n_ws_tokens": F.size(ws).cast("int"),
        "n_bpe_tokens": F.regexp_count(text, F.lit(BPE_PRETOKEN_RE)).cast("int"),
    }


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document text profile: stats + tokens + lang + quality.

    The words array is split ONCE into a projected column and every
    consumer (stats, tokens, lang scores, fingerprint shingles) reads
    that column — the inline-expression form re-ran the regex split per
    use and per shingle element (measured 8.3 s → 1 s at sf0.1)."""
    text = F.col(text_col)
    pre = docs.select("doc_id", "lang", text_col, words(text).alias("_ws"))
    ws = F.col("_ws")
    stats = text_stats(text, ws)
    toks = token_counts(text, ws)
    df = pre.select(
        "doc_id",
        "lang",
        *[c.alias(n) for n, c in stats.items()],
        *[c.alias(n) for n, c in toks.items()],
        *lang_scores(text, ws),
        fingerprint(text, ws).alias("fingerprint"),
    )
    return df.withColumn("pred_lang", predict_lang()).withColumn(
        "quality", quality_score()
    )


# --- repetition / boilerplate quality metrics (Gopher-style) --------------

def word_ngrams(ws: Column, n: int) -> Column:
    """Word n-grams of a MATERIALIZED words column as 'w1 w2 ...' strings;
    docs with fewer than n words get an empty array (a repetition metric
    over no n-grams is 0, not a degenerate self-gram)."""

    def gram(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(ws, (i + k + 1).cast("int")) for k in range(n)]
        )

    return F.when(
        F.size(ws) >= n,
        F.transform(F.sequence(F.lit(0), F.size(ws) - n), gram),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_count(grams: Column) -> Column:
    """Occurrences of the most frequent n-gram: max equal-adjacent run
    over the SORTED gram array, via a single struct-accumulator fold —
    per-row only, no explode/groupBy, so the whole metric stays narrow
    (the repetition filters of Rae et al. 2021 [Gopher §A1.1] computed
    with zero shuffles; at 100 TB this is embarrassingly parallel)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(a: Column, x: Column) -> Column:
        run = F.when(a["prev"].eqNullSafe(x), a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(grams), zero, step, lambda a: a["best"])


def repetition_metrics(bg: Column, tg: Column) -> dict[str, Column]:
    """Per-document repetition fractions over MATERIALIZED bigram/trigram
    columns: top_bigram_frac = occurrences of the most common bigram /
    total bigrams; dup_trigram_frac = fraction of trigram occurrences
    that are repeats. High values flag boilerplate/generated text — the
    standard pre-training quality gates alongside text_stats()."""
    top_frac = F.when(
        F.size(bg) > 0, top_ngram_count(bg) / F.size(bg)
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.size(tg) > 0,
        (F.size(tg) - F.size(F.array_distinct(tg))) / F.size(tg),
    ).otherwise(F.lit(0.0))
    return {"top_bigram_frac": top_frac, "dup_trigram_frac": dup_frac}


# --- sequence packing (token-budget concat-and-chunk) ---------------------

def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its span of fixed-budget training sequences
    under GPT-style concat-and-chunk packing: within a shard, documents
    are concatenated in ``order_col`` order and the token stream is cut
    every ``budget`` tokens. Emits per document:

    - ``tok_start`` — offset of the doc's first token in the shard stream
    - ``seq_first`` / ``seq_last`` — indices (within the shard) of the
      training sequences the doc's tokens land in
    - ``n_seqs`` — how many sequence boundaries the doc spans

    Scale: ONE shuffle on ``shard_col``; the cumulative sum is a
    per-shard ordered window, so shards are the parallel unit — exactly
    how a production packing job is laid out (pack within file/shard,
    never a global total order, which would serialize on one partition).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.col(n_tokens_col)
    tok_start = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0)).cast("long")
    out = docs.withColumn("tok_start", tok_start)
    seq_first = F.floor(F.col("tok_start") / budget)
    # a zero-token doc sits AT its offset, never before it
    seq_last = F.greatest(
        seq_first, F.floor((F.col("tok_start") + n_tok - 1) / budget)
    )
    return (
        out.withColumn("seq_first", seq_first.cast("int"))
        .withColumn("seq_last", seq_last.cast("int"))
        .withColumn(
            "n_seqs", (F.col("seq_last") - F.col("seq_first") + 1).cast("int")
        )
    )


# --- PII redaction (regex scrub; the pre-release privacy pass) ------------

# Patterns restricted to the regex intersection of Java (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b — no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction order matters and is part of the contract: emails first (their
# local/domain parts may contain digit runs a later pattern could bite
# into), then phones, then bare IPv4s.
PII_RULES: tuple[tuple[str, str], ...] = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_PHONE_RE, "<PHONE>"),
    (PII_IPV4_RE, "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts for each PII class (pre-redaction)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("int"),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("int"),
        "n_ipv4": F.regexp_count(text, F.lit(PII_IPV4_RE)).cast("int"),
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class placeholder, in PII_RULES
    order. Pure regexp_replace chain — narrow, zero-shuffle, whole-stage
    codegen; at 100 TB this is a free rider on any scan."""
    out = text
    for pat, tag in PII_RULES:
        out = F.regexp_replace(out, pat, tag)
    return out


# --- HTML boilerplate strip (tag removal + entity unescape) ---------------

# The entity subset every curation pipeline actually meets; applied after
# tag removal so entity-encoded angle brackets can't re-form tags, and
# with &amp; decoded LAST (the standard order) so doubly-escaped input
# like "&amp;lt;" decodes to the literal "&lt;", never to "<".
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
HTML_TAG_RE = r"<[^>]*>"


def strip_html(html: Column) -> Column:
    """Markup → clean text: drop tags, unescape common entities, collapse
    whitespace. regexp_replace + replace chain — same zero-shuffle shape
    as redact_pii."""
    out = F.regexp_replace(html, HTML_TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# --- overlapping-window document chunking ---------------------------------

def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into overlapping windows
    (context windows for embedding/retrieval indexing): chunk i covers
    tokens [i*stride, i*stride + window). The last chunk starts at the
    final stride offset that still introduces new tokens, so every token
    is covered and no chunk is empty.

    Per-row sequence + explode — the chunk grid never leaves the row
    until the explode, and the explode multiplies rows by ~n/stride
    without any shuffle, so the op stays embarrassingly parallel at
    100 TB (chunks of one doc stay in its partition).
    """
    if stride <= 0 or window < stride:
        raise ValueError("need stride >= 1 and window >= stride")
    # empty-token filter: split('') yields [''], which would otherwise
    # become a phantom 1-token chunk for blank docs (and blank docs
    # would all share md5('') spans, counting each other as dups in the
    # q68 family) — blank docs emit ZERO chunks instead.
    base = docs.withColumn(
        "_ws",
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ),
    ).filter(F.size("_ws") > 0)
    n = F.size(F.col("_ws"))
    # number of chunks: 1 + ceil(max(0, n - window) / stride), in exact
    # integer arithmetic (`div` floors like DuckDB's //).
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.expr(f"1 + (size(_ws) - {window} + {stride} - 1) div {stride}")
    )
    d = base.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    tok_start = F.col("chunk_id") * stride
    chunk = F.slice(F.col("_ws"), tok_start + 1, window)
    return d.select(
        id_col,
        F.col("chunk_id").cast("int"),
        (tok_start + 1).cast("int").alias("tok_start"),
        F.size(chunk).cast("int").alias("n_toks"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )
