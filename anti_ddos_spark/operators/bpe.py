"""Distributed BPE (byte-pair encoding) vocabulary learning and
tokenization — the learned-subword extension of the fixed-regex
pretokenizer surface (operators/text.py ``token_counts``; the reference
engine itself never learns a vocabulary, so this module is part of the
training-data-pipeline family, not reference parity).

Algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — public knowledge. Words are
split to character symbols; each merge step finds the most frequent
adjacent symbol pair in the (count-weighted) word histogram and fuses
every occurrence; tokenizing applies the learned merges in rank order.

Scale posture (the part that matters at 100 TB):

- The corpus-sized work is ONE aggregate: the word histogram (pretoken
  explode → map-side-combined count, a single shuffle on ``word``).
- Every learning iteration after that runs on the V-row histogram —
  Heaps-bounded (V ~ n^0.5 on real text; scripts/scale_probe.py
  ``--fixture zipf`` measures exactly this growth), NOT corpus-bounded
  — and collects exactly ONE row per iteration (the argmax pair), the
  same bounded-collect class as the k-means centroid loop.
- Tokenization applies the k learned merges as a chain of k Catalyst
  ``aggregate`` (ArrayAggregate) folds inside a ``transform`` over the
  word array: pure JVM expressions, zero Python in the row path, zero
  shuffles (plan-pinned in tests/test_bpe.py).

Why one left-to-right pass per merge, in rank order, equals the
reference algorithm's repeated min-rank rescan: a learned rule's two
symbols always predate the rule, and symbols are only ever concatenated
— never split — so applying a LATER merge can never create a new
adjacency of two EARLIER symbols (any merge touching a neighbor of
``a`` yields a symbol different from ``b``). Hence by the time pass i
runs, every (a_i, b_i) adjacency that will ever exist is already
present, and one greedy left-to-right pass fuses them all exactly as
the rescan would. Pinned against a pure-Python reference
implementation (including hypothesis-generated corpora) in
tests/test_bpe.py.

Determinism contract: pair argmax ties break lexically on (a, b)
ascending; counts are exact longs; the merge list for a given corpus is
therefore engine-independent, which is what lets q124's DuckDB oracle
replay the same merges (generated SQL, ``bpe_sql_tokens``) and
hash-match token-for-token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Shared cross-engine pre-tokenizer: lowercase, split on runs of
# non-alphanumerics, drop empties. Restricted to [a-z0-9] symbols so
# merge literals never need SQL escaping.
WORD_SPLIT_RE = "[^a-z0-9]+"


def words_expr(text_col: Column) -> Column:
    """Non-empty lowercase words of a text column (array<string>)."""
    return F.filter(
        F.split(F.lower(text_col), WORD_SPLIT_RE),
        lambda w: F.length(w) > 0,
    )


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The single corpus-sized pass: (word, cnt) histogram.

    One explode + one map-side-combined count; everything downstream of
    this frame is V-bounded.
    """
    return (
        docs.select(F.explode(words_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_fold(syms: Column, a: str, b: str) -> Column:
    """One greedy left-to-right pass fusing every (a, b) adjacency.

    A Catalyst ``aggregate`` fold: append each symbol unless the
    accumulator's tail is ``a`` and the symbol is ``b``, in which case
    the tail becomes ``a || b``. Overlaps resolve left-first ("aaa"
    under (a,a) → [aa, a]), matching the reference implementation's
    non-overlapping left-to-right scan.
    """
    ab = a + b
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def segment_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Segment one word: chars → the k merge folds in rank order."""
    e = F.split(word, "")
    for a, b in merges:
        e = merge_fold(e, a, b)
    return e


def tokens_expr(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """BPE token stream of a text column (array<string>); zero shuffle."""
    return F.flatten(
        F.transform(words_expr(text_col), lambda w: segment_expr(w, merges))
    )


def bpe_learn(
    hist: DataFrame, num_merges: int = 12, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a (word, cnt) histogram.

    Each iteration: count adjacent symbol pairs weighted by word count
    (V-bounded shuffle), collect the single argmax row (count desc,
    then (a, b) lexically — the determinism contract), and fuse the
    pair across the histogram. Stops early when the best pair's count
    falls below ``min_count``. The histogram is persisted per iteration
    so iteration i+1 scans materialized symbols, not an i-deep
    expression lineage.
    """
    cur = hist.select(F.split("word", "").alias("syms"), "cnt").persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            top = (
                cur.select(
                    F.explode(
                        F.zip_with(
                            F.slice("syms", 1, F.size("syms") - 1),
                            F.slice("syms", 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("a"), b.alias("b")
                            ),
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = cur.select(
                merge_fold(F.col("syms"), a, b).alias("syms"), "cnt"
            ).persist()
            try:
                nxt.count()
            except Exception:
                # don't strand the freshly pinned frame if
                # materialization fails mid-learn
                nxt.unpersist()
                raise
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_tokenize(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-document BPE tokens under a learned merge list."""
    return docs.withColumn("bpe_tokens", tokens_expr(F.col(text_col), merges))


# --- DuckDB twin (generated SQL for the q124 oracle) ---------------------


def _sql_segment(chars_sql: str, merges: list[tuple[str, str]]) -> str:
    """Nested list_reduce folds replaying ``merge_fold`` per merge.

    Lambda variable names are uniqued per nesting level (DuckDB scopes
    lambdas lexically). ``list_reduce`` has no initial accumulator, so
    symbols are lifted to single-element lists and the first element
    seeds the fold — identical to the Spark fold, whose first iteration
    can never match an empty-tail accumulator.
    """
    e = f"list_transform({chars_sql}, s0 -> [s0])"
    for i, (a, b) in enumerate(merges):
        acc, x = f"a{i}", f"x{i}"
        e = (
            f"list_transform(list_reduce({e}, ({acc}, {x}) -> "
            f"CASE WHEN len({acc}) > 0 AND {acc}[len({acc})] = '{a}' "
            f"AND {x}[1] = '{b}' "
            f"THEN list_concat({acc}[1:len({acc})-1], ['{a}{b}']) "
            f"ELSE list_concat({acc}, {x}) END), s{i + 1} -> [s{i + 1}])"
        )
    # unwrap the single-element lift of the last level
    return f"list_transform({e}, su -> su[1])"


def bpe_sql_tokens(text_sql: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB expression for the full token stream of ``text_sql``."""
    words = (
        f"list_filter(regexp_split_to_array(lower({text_sql}), "
        f"'{WORD_SPLIT_RE}'), w0 -> len(w0) > 0)"
    )
    chars = "list_transform(range(1, len(w) + 1), ci -> w[ci])"
    seg = _sql_segment(chars, merges)
    return f"flatten(list_transform({words}, w -> {seg}))"


def bpe_tokenize_via_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """The saturated-corpus twin of ``bpe_tokenize``: segmentation is a
    pure function of the WORD, so run the merge folds over the DISTINCT
    vocabulary (V rows, Heaps-bounded) and join the word→tokens mapping
    back to the positional token stream, re-assembling per-document
    order with the sort_array(collect_list(struct)) pattern.

    Trade against the fold form (measured, PERF.md round-7): the fold
    form is zero-shuffle but its per-row compute is CORPUS-sized (every
    occurrence of every word re-runs the k folds); this form pays one
    doc_id shuffle (plus a vocab broadcast) but does the k folds exactly
    V times. Past vocabulary saturation — every corpus eventually —
    corpus/V occurrences per word make the V-bounded form the 100 TB
    path. ``broadcast_vocab=False`` switches the mapping join to a
    shuffle join for vocabularies too large to broadcast (100M+ words);
    the segmentation compute stays V-bounded either way.

    Precondition: ``docs`` rows must be unique across ``docs.columns``
    (in practice: include a key column — every fixture table has one).
    The positional re-assembly groups by the full row, so two
    byte-identical input rows would collapse into one output row with
    a doubled token array where ``bpe_tokenize`` emits two rows.
    Row-for-row fidelity means: under that precondition, every input
    row (including wordless ones, via posexplode_outer) yields exactly
    one output row.
    """
    word_toks = (
        docs.select(F.explode(words_expr(F.col(text_col))).alias("word"))
        .distinct()
        .select("word", segment_expr(F.col("word"), merges).alias("word_toks"))
    )
    if broadcast_vocab:
        word_toks = F.broadcast(word_toks)
    # posexplode_OUTER keeps documents with zero alphanumeric words as a
    # single (pos=null, word=null) row, so the twin is row-for-row
    # faithful to bpe_tokenize without a second corpus join: the null
    # word left-joins to a null mapping, flatten propagates the null,
    # and the coalesce lands the empty token array.
    pos = docs.select(
        *docs.columns,
        F.posexplode_outer(words_expr(F.col(text_col))).alias("pos", "word"),
    )
    other = [c for c in docs.columns]
    return (
        pos.join(word_toks, "word", "left")
        .groupBy(*other)
        .agg(
            F.coalesce(
                F.flatten(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "word_toks"))
                        ),
                        lambda s: s["word_toks"],
                    )
                ),
                F.expr("CAST(array() AS array<string>)"),
            ).alias("bpe_tokens")
        )
    )
