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


# --- round 8: the exact local trainer and the rescan boundary -------------


def test_local_trainer_matches_distributed(spark):
    """bpe_learn_local (queue-based pair maintenance over the collected
    histogram — the production trainer) must produce the EXACT merge
    list of the distributed loop and the textbook reference, including
    tie-breaks and the min_count stop."""
    from anti_ddos_spark.operators.bpe import bpe_learn_local

    words = {
        "lower": 5, "lowest": 3, "newer": 6, "wider": 2, "low": 7,
        "aaa": 3, "abab": 4, "a0b1": 1, "banana": 2,
    }
    want = ref_learn(words, 25)
    assert bpe_learn_local(list(words.items()), 25) == want
    assert bpe_learn(spark_hist(spark, words), 25) == want
    # DataFrame input path too
    assert bpe_learn_local(spark_hist(spark, words), 25) == want


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc01", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    )
)
def test_local_trainer_matches_reference_hypothesis(words):
    from anti_ddos_spark.operators.bpe import bpe_learn_local

    assert bpe_learn_local(list(words.items()), 8) == ref_learn(words, 8)


# --- bounded histogram collect (r9 verdict task #2) ------------------------


def test_capped_trainer_certified_identity(spark):
    """On a Zipf-shaped histogram (heavy head, singleton tail) a floor
    of 2 must (a) collect only the head, (b) certify via the margin
    bound, and (c) — as the certificate proves — produce the exact
    trainer's merge list."""
    from anti_ddos_spark.operators.bpe import bpe_learn_capped, bpe_learn_local

    head = {"ab": 1000, "cd": 600, "ce": 300}
    tail = {f"zx{i:02d}q": 1 for i in range(50)}  # 50 singleton junk words
    hist = spark_hist(spark, {**head, **tail})
    merges, stats = bpe_learn_capped(hist, num_merges=3, hist_floor=2)
    assert stats["rows_kept"] == len(head)
    assert stats["rows_dropped"] == len(tail)
    # Σ cnt·(|w|−1) = 50 · 4
    assert stats["dropped_adjacency_mass"] == 200
    assert stats["stop_reason"] == "num_merges"
    assert stats["min_margin"] > 200
    assert stats["certified"] is True
    assert stats["certified_prefix"] == len(merges) == 3
    assert merges == bpe_learn_local(hist, num_merges=3)


def test_capped_trainer_uncertified_when_tail_decides(spark):
    """When the dropped tail's mass can flip an argmax the certificate
    must refuse — and here the tail REALLY decides: the exact list
    diverges from the capped one."""
    from anti_ddos_spark.operators.bpe import bpe_learn_capped, bpe_learn_local

    # capped view: (a,b)=10 from 'ab', (c,d)=9 from 'cd';
    # tail: 4 distinct singleton 'cd'-words push true (c,d) to 13
    words = {"ab": 10, "cd": 9}
    tail = {f"{x}cd": 1 for x in ("e", "f", "g", "h")}
    hist = spark_hist(spark, {**words, **tail})
    capped, stats = bpe_learn_capped(hist, num_merges=1, hist_floor=2)
    assert stats["certified"] is False
    # margin (10-9=1) ≤ M (4 words × 2 adjacencies = 8): nothing proven
    assert stats["certified_prefix"] == 0
    assert capped == [("a", "b")]
    assert bpe_learn_local(hist, num_merges=1) == [("c", "d")]


def test_capped_floor_one_is_exact_noop(spark):
    """hist_floor=1 collects everything: zero dropped, certified, and
    byte-identical merges to bpe_learn_local."""
    from anti_ddos_spark.operators.bpe import bpe_learn_capped, bpe_learn_local

    words = {"lower": 5, "lowest": 3, "newer": 6, "banana": 2, "q": 1}
    hist = spark_hist(spark, words)
    merges, stats = bpe_learn_capped(hist, num_merges=20, hist_floor=1)
    assert stats["rows_dropped"] == 0
    assert stats["dropped_adjacency_mass"] == 0
    assert stats["certified"] is True
    assert stats["certified_prefix"] == len(merges)
    assert merges == bpe_learn_local(hist, num_merges=20)


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd01", min_size=1, max_size=7),
        st.integers(min_value=1, max_value=30),
        min_size=1,
        max_size=16,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_capped_certificate_theorem_hypothesis(words, floor):
    """The mass-bound theorem, property-tested: whatever the corpus and
    floor, (a) the certified PREFIX always equals the exact trainer's
    prefix, and (b) a fully-certified run equals the exact merge list
    outright. (Divergence beyond the certified prefix is allowed —
    that's the point of the bound.)"""
    from anti_ddos_spark.operators.bpe import _heap_trainer

    rows = sorted(words.items())
    kept = [(w, c) for w, c in rows if c >= floor]
    dropped = [(w, c) for w, c in rows if c < floor]
    m = sum(c * (len(w) - 1) for w, c in dropped)
    exact = ref_learn(dict(rows), 10)
    capped, margins, stop_reason = _heap_trainer(
        kept, 10, 2, track_margins=True
    )
    if m == 0:
        certified_prefix = len(capped)
        certified = True
    else:
        certified_prefix = next(
            (i for i, g in enumerate(margins) if g <= m), len(capped)
        )
        certified = (
            certified_prefix == len(capped) and stop_reason == "num_merges"
        )
    assert capped[:certified_prefix] == exact[: certified_prefix]
    if certified:
        assert capped == exact


def test_capped_min_count_stop_not_certified_with_dropped_mass(spark):
    """A min_count stop with dropped mass cannot be certified: the
    exact trainer might have continued on tail-carried pairs."""
    from anti_ddos_spark.operators.bpe import bpe_learn_capped

    words = {"ab": 10, "cd": 3}
    tail = {f"{x}xy": 1 for x in ("e", "f", "g")}
    hist = spark_hist(spark, {**words, **tail})
    merges, stats = bpe_learn_capped(
        hist, num_merges=5, min_count=5, hist_floor=2
    )
    assert merges == [("a", "b")]
    assert stats["stop_reason"] == "min_count"
    assert stats["certified"] is False


def rescan_tokenize_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sennrich-style reference applier: repeatedly find the LOWEST-rank
    merge applicable anywhere in the word and apply it, until none
    applies — the min-rank rescan convention."""
    rank = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return syms
        syms = ref_merge_word(syms, *merges[best])


def single_pass_tokenize_word(word: str, merges) -> list[str]:
    syms = list(word)
    for a, b in merges:
        syms = ref_merge_word(syms, a, b)
    return syms


def _later_output_hits_earlier_operand(merges) -> bool:
    """The ADVICE r8 boundary: some later merge's OUTPUT string equals
    an operand of an EARLIER merge — the only way the single-pass
    convention can miss an adjacency the rescan would fuse."""
    for i, (a, b) in enumerate(merges):
        for j in range(i + 1, len(merges)):
            if merges[j][0] + merges[j][1] in (a, b):
                return True
    return False


def test_rank_order_pass_vs_min_rank_rescan_boundary():
    """(1) The conventions DO diverge on a crafted out-of-convention
    list — the docstring's weakened claim is honest; (2) the divergence
    requires exactly the later-output-collides-with-earlier-operand
    boundary condition."""
    # crafted: rank-0 merge (ab, c) whose operand 'ab' is only CREATED
    # by the rank-1 merge (a, b) — unreachable by bpe_learn on any
    # corpus (a learned rule's operands predate it), but legal input
    merges = [("ab", "c"), ("a", "b")]
    assert single_pass_tokenize_word("abc", merges) == ["ab", "c"]
    assert rescan_tokenize_word("abc", merges) == ["abc"]
    assert _later_output_hits_earlier_operand(merges)


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="ab01", min_size=1, max_size=7),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=10,
    ),
    st.text(alphabet="ab01", min_size=0, max_size=10),
)
def test_learned_lists_agree_or_hit_the_boundary(words, probe_word):
    """On LEARNED merge lists, any single-pass/rescan divergence must
    be attributable to the documented boundary condition — agreement
    everywhere else (hypothesis-checked, per ADVICE r8)."""
    merges = ref_learn(words, 8)
    for w in list(words) + [probe_word]:
        if single_pass_tokenize_word(w, merges) != rescan_tokenize_word(
            w, merges
        ):
            assert _later_output_hits_earlier_operand(merges), (w, merges)


def test_local_trainer_ladder_is_fast():
    """The r7 verdict target: ≤ 0.1 s amortized per merge at 1000
    merges. The local trainer runs the ladder on a synthetic Zipf-ish
    histogram in well under that (measured ~µs/merge; the generous
    bound keeps slow-CI noise out)."""
    import time

    words = {}
    for i in range(4000):
        w = format(i * 2654435761 % (36**6), "06x") + "abc"[i % 3]
        words[w] = words.get(w, 0) + 1 + (i % 7)
    from anti_ddos_spark.operators.bpe import bpe_learn_local

    t0 = time.perf_counter()
    merges = bpe_learn_local(list(words.items()), 1000)
    dt = time.perf_counter() - t0
    assert len(merges) >= 500
    assert dt / max(len(merges), 1) <= 0.1, dt
    # spot-check exactness at depth on the same histogram
    assert merges[:120] == ref_learn(words, 120)


def test_frozen_vocab_artifact_regenerates_byte_exact(spark):
    """The committed BPE vocabulary (artifacts/bpe_merges.json) must be
    exactly what re-learning from its pinned fixture produces — the
    q133-style drift pin, applied to the tokenizer artifact behind
    q136's static oracle."""
    import hashlib
    import json
    import os

    from anti_ddos_spark.operators.bpe import (
        bpe_learn_local,
        word_histogram,
    )

    art = os.path.join(
        os.path.dirname(__file__), "..", "anti_ddos_spark", "artifacts",
        "bpe_merges.json",
    )
    with open(art) as f:
        meta = json.load(f)
    docs = spark.read.parquet(
        os.path.join(meta["train_fixture"], "documents.parquet")
    )
    relearned = bpe_learn_local(
        word_histogram(docs), meta["num_merges_requested"]
    )
    assert [list(m) for m in relearned] == meta["merges"]
    canon = "\n".join(f"{a} {b}" for a, b in relearned)
    assert hashlib.sha256(canon.encode()).hexdigest() == meta["merges_sha256"]


# --- production-size apply: segment_word / bpe_tokenize_large_vocab -------


def chain_segment(word: str, merges) -> list[str]:
    """The contract: one left-to-right pass per merge, in rank order."""
    syms = list(word)
    for a, b in merges:
        syms = ref_merge_word(syms, a, b)
    return syms


def test_segment_word_matches_fold_chain_fixed():
    from anti_ddos_spark.operators.bpe import segment_word

    for w in ("", "a", "abab", "aaab", "lowest", "ababa", "abcabc"):
        assert segment_word(w, MERGES) == chain_segment(w, MERGES), w


def test_segment_word_skips_recreated_earlier_rank():
    """The heap segmenter must implement the single-pass convention, not
    min-rank rescan: rank-2's fusion recreates rank-0's pair string via
    a different derivation, and the pass for rank 0 is already spent."""
    from anti_ddos_spark.operators.bpe import segment_word

    merges = [("b", "c"), ("a", "b"), ("ab", "c")]
    # chain on "abc": (b,c) makes [a,bc]; (a,b) no-op; (ab,c) no-op.
    assert chain_segment("abc", merges) == ["a", "bc"]
    assert segment_word("abc", merges) == ["a", "bc"]


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ab", min_size=0, max_size=12),
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=3),
            st.text(alphabet="ab", min_size=1, max_size=3),
        ),
        max_size=8,
    ),
)
def test_segment_word_matches_fold_chain_hypothesis(word, merges):
    """Adversarial merge lists (NOT learned — arbitrary pairs, duplicate
    operands, recreated adjacencies) over a 2-letter alphabet, where
    pair recreation through alternate derivations is as dense as it
    gets. The heap segmenter must equal the fold chain byte-for-byte."""
    from anti_ddos_spark.operators.bpe import segment_word

    assert segment_word(word, merges) == chain_segment(word, merges)


def test_large_vocab_apply_matches_fold_apply(spark):
    """bpe_tokenize_large_vocab (UDF-segmented vocabulary) must equal
    bpe_tokenize (fold chain) row-for-row — the same contract the fold
    vocab twin pins, now for the path that survives 30k merges."""
    from anti_ddos_spark.operators.bpe import (
        bpe_tokenize,
        bpe_tokenize_large_vocab,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(df, MERGES).select("doc_id", "bpe_tokens").collect()
    }
    for bc in (True, False):
        for keys in (None, ["doc_id"]):
            res = bpe_tokenize_large_vocab(
                df, MERGES, broadcast_vocab=bc, key_cols=keys
            )
            assert res.columns == ["doc_id", "text", "bpe_tokens"]
            got = {
                r["doc_id"]: r["bpe_tokens"]
                for r in res.select("doc_id", "bpe_tokens").collect()
            }
            assert got == want, f"broadcast_vocab={bc} key_cols={keys}"


def test_large_vocab_apply_null_key_fails_loudly(spark):
    """r9 ADVICE: a null document key would collapse in the positional
    reassembly and then vanish in the inner join-back — the keyed path
    must raise instead of silently losing rows (the no-key path, which
    groups by the full row, keeps them)."""
    import pytest

    from anti_ddos_spark.operators.bpe import bpe_tokenize_large_vocab

    df = spark.createDataFrame(
        [(0, "ab ab"), (None, "cd cd")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="null document key|USER_RAISED"):
        bpe_tokenize_large_vocab(df, MERGES, key_cols=["doc_id"]).collect()
    # the no-key path still preserves the null-key row
    rows = bpe_tokenize_large_vocab(df, MERGES).collect()
    assert len(rows) == 2


def test_large_vocab_apply_matches_frozen_artifact(spark):
    """On the committed 32-merge vocabulary over real fixture documents,
    the UDF-segmented apply reproduces q136's fold-applied token stream
    exactly (so the large-vocab path inherits the frozen artifact's
    cross-engine oracle transitively)."""
    from anti_ddos_spark.operators.bpe import (
        bpe_tokenize,
        bpe_tokenize_large_vocab,
    )
    from anti_ddos_spark.queries.textops_prep import _frozen_bpe_merges

    merges = _frozen_bpe_merges()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    want = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize_large_vocab(docs, merges)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    assert got == want


def test_bpe_30k_artifact_pins():
    """The v2 (production-size) committed vocabulary: 30k merges learned
    from the 5M-doc Zipf decade (scripts/bpe30k_ladder.py — corpus
    params recorded in the artifact, deterministic builder, so regen is
    reproducible offline). Pins: recorded sha256 matches the merge
    list; the list is DERIVABLE (every multi-char operand is the output
    of an earlier merge — the structural invariant any real BPE
    vocabulary satisfies); and the heap segmenter equals the fold-chain
    contract under the full 30k list on fixture words."""
    import hashlib
    import json
    import os

    from anti_ddos_spark.operators.bpe import merge_ranks, segment_word

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "anti_ddos_spark", "artifacts", "bpe_merges_30k.json",
    )
    with open(path) as f:
        meta = json.load(f)
    merges = [tuple(m) for m in meta["merges"]]
    assert len(merges) == meta["learned"] == 30_000
    canon = "\n".join(f"{a} {b}" for a, b in merges)
    assert hashlib.sha256(canon.encode()).hexdigest() == meta["merges_sha256"]
    producible = set("abcdefghijklmnopqrstuvwxyz0123456789")
    for a, b in merges:
        assert a in producible and b in producible, (a, b)
        producible.add(a + b)
    # apply parity at full production size: heap segmenter == fold chain
    ranks = merge_ranks(merges)
    words = [a + b for a, b in merges[:40]] + [
        "abcd", "zzzz", "a", "", "q0q0q0",
    ]
    for w in words:
        assert segment_word(w, merges, ranks) == chain_segment(w, merges), w


def test_segment_word_handles_duplicate_pairs():
    """A merge list can contain the same pair at two ranks (the trainer,
    like the textbook reference, recounts stats per iteration, so a pair
    recreated by an alternate derivation can be learned again). The
    chain runs BOTH passes — the second fuses adjacencies created
    between the two ranks — and the heap segmenter must too (round-9
    review finding: a rank lookup that collapsed duplicates returned
    ['a','bb'] here)."""
    from anti_ddos_spark.operators.bpe import segment_word

    merges = [("a", "b"), ("b", "b"), ("a", "b")]
    assert chain_segment("abb", merges) == ["ab", "b"]
    assert segment_word("abb", merges) == ["ab", "b"]
    # exhaustive fuzz over the divergence-dense space: all words/lists
    # small enough to enumerate
    import itertools

    pool = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "b"), ("ab", "b")]
    for word in ("abab", "abb", "aabb", "babab"):
        for n in (2, 3):
            for ms in itertools.product(pool, repeat=n):
                ms = list(ms)
                assert segment_word(word, ms) == chain_segment(word, ms), (
                    word, ms,
                )


def test_large_vocab_apply_matches_fold_apply_with_duplicate_pairs(spark):
    """Frame-level twin of the duplicate-rank regression: a merge list
    containing the same pair at two ranks must tokenize identically
    through the fold chain and the UDF-segmented vocab join."""
    from anti_ddos_spark.operators.bpe import (
        bpe_tokenize,
        bpe_tokenize_large_vocab,
    )

    merges = [("a", "b"), ("b", "b"), ("a", "b"), ("ab", "b")]
    df = spark.createDataFrame(
        [(0, "abb abab babb"), (1, "aab b abbb"), (2, "")],
        "doc_id long, text string",
    )
    want = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize_large_vocab(df, merges, key_cols=["doc_id"])
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    assert got == want


def test_tokens_expr_string_fast_path_matches_lambda_form(spark):
    """r12 verdict task #3: the one-expr() build (string argument) and
    the Column-lambda build must resolve to the same tokens — including
    the left-first overlap contract ("aaa" under (a,a) -> [aa, a])."""
    import pyspark.sql.functions as F

    from anti_ddos_spark.operators.bpe import tokens_expr

    merges = [("a", "a"), ("aa", "b"), ("c", "d")]
    df = spark.createDataFrame(
        [(1, "aaa aab"), (2, "cd CDcd!x"), (3, ""), (4, "aaab cda")],
        "doc_id long, text string",
    )
    fast = sorted(
        (r["doc_id"], tuple(r["toks"]))
        for r in df.select(
            "doc_id", tokens_expr("text", merges).alias("toks")
        ).collect()
    )
    slow = sorted(
        (r["doc_id"], tuple(r["toks"]))
        for r in df.select(
            "doc_id", tokens_expr(F.col("text"), merges).alias("toks")
        ).collect()
    )
    assert fast == slow
    d = dict(fast)
    # "aaa" -> [aa, a] (left-first); "aab" -> [aa, b] -> [aab]
    assert d[1] == ("aa", "a", "aab")
