"""sf1-equivalent headroom probe: measure how the flagship plans scale.

Builds a 10x replication of the sf0.1 `events` / `documents` /
`embeddings` tables (≈ sf1: 1M events, 50k docs, 20k vectors) and times
the five most expensive headline queries at sf0.01 / sf0.1 / 10x,
reporting the per-decade scaling exponent alpha where
t(10n) ≈ 10^alpha · t(n). alpha ≈ 1 is linear; the shuffle-bounded
claims in PERF.md predict alpha ≤ ~1.1 for every flagship plan.

Replication is designed so the SEMANTICS scale linearly too, not just
the row count — naive duplication would make every row an exact dup and
push the near-dup joins quadratic, proving nothing:

- events: user_id (the flow key in events_as_packets) and event_id are
  offset per replica → 10x distinct flows of unchanged length; the time
  span is unchanged, so session windows per user keep their shape.
- documents: doc_id offset; text gets a per-replica `r{k} ` prefix, so
  within-replica shingle relationships are preserved while cross-replica
  pairs don't become spurious near-dups.
- embeddings: vec_id offset; each replica's vectors are multiplied by a
  deterministic per-replica ±1 sign pattern — a diagonal orthogonal
  transform, so within-replica angles (and thus the true near-dup pair
  set) are preserved EXACTLY, while cross-replica cosines are
  sign-randomized to ~0. Near-dup output therefore scales exactly 10x.

Usage: python scripts/scale_probe.py [--scales 10] [--runs 2]
       [--queries q34_ngram_jaccard,neardup_prod_params]
       [--tables documents,embeddings]

--scales takes a comma list of replica factors (e.g. ``10,100``): one
replicated dir is built per factor and each probe is timed at every
scale, with a per-adjacent-decade alpha between consecutive scales —
the round-5 form of the probe, which extends the two r4 watch rows
(q34, production-banded near-dup) a further decade. --tables limits
which tables are replicated (the 100x events table is 100M rows and
irrelevant to the document/embedding watch rows).

Writes one JSON line per (query, scale) and a summary with exponents.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

PROBE_QUERIES = [
    "q24_flow_features_full",
    "q20_event_sessions",
    "q35_minhash_prod",
    "q34_ngram_jaccard",
    "q42_cosine_neardup_pairs",
    "q37_curation_funnel",
]


def _neardup_prod(spark, sf_dir):
    """q42's operator at PRODUCTION banding (4 bands x 8 Gaussian planes
    → 256 buckets/band). q42 itself is pinned to the oracle's demo
    banding (2x4 → 16 buckets/band), which is deliberately permissive
    and goes near-quadratic once the corpus outgrows the bucket count —
    the same demo-vs-production split bench.py notes for q32/q35. This
    is the shape a production corpus would run."""
    from anti_ddos_spark.operators.similarity import lsh_neardup_pairs
    from anti_ddos_spark.queries.base import t

    return lsh_neardup_pairs(
        t(spark, sf_dir, "embeddings"), 0.8, n_bands=4, planes_per_band=8
    )


def _neardup_adaptive(spark, sf_dir):
    """The near-dup operator under the SCALE-ADAPTIVE parameter policy
    (config.lsh_planes_for): bucket space sized to the corpus so
    occupancy stays ~constant. The fixed-parameter twin above saturates
    at the 100x decade (measured: disk-spill death); this row is the
    posture a growing corpus actually runs."""
    from anti_ddos_spark.config import lsh_planes_for
    from anti_ddos_spark.operators.similarity import lsh_neardup_pairs
    from anti_ddos_spark.queries.base import t

    emb = t(spark, sf_dir, "embeddings")
    planes = lsh_planes_for(emb.count())
    return lsh_neardup_pairs(emb, 0.8, n_bands=4, planes_per_band=planes)


def _jaccard_w5(spark, sf_dir):
    """Round-6 task #7: the LARGER-token-space fix for q34's saturated
    corpus — 5-gram Jaccard via the same recall-1 prefix-filtered join
    (w=5 multiplies the token space, pushing the n²/V candidate floor
    out without the df-cap's recall trade; parity/recall-1 unit:
    tests/test_jaccard_cap.py::test_wider_ngram_is_exact_vs_bruteforce)."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), ngram_w=5)


def _jaccard_capped(spark, sf_dir):
    """q34's operator under the DF-CAPPED posture at w=3: n-grams whose
    document frequency exceeds an absolute cap are dropped as join keys.
    This probe measures the COST curve only — round 7's recall
    measurement (scripts/zipf_recall.py) showed the w=3 capped form's
    recall collapses past ~100k docs (char-trigram space is bounded at
    |alphabet|³, so no trigram stays rare); the recall-keeping capped
    form is `jaccard_capped_w5` below. The cap
    is absolute, not corpus-relative: the whole point is that candidate
    volume per join key stays ≤ cap² no matter how large the corpus
    grows, which is what the exact recall-1 form cannot promise (its
    n²/V floor is a counting fact — measured to a >79 GB spill death at
    5M Zipf docs; PERF.md round-7). The cap value is a knob
    (SPARK_GRAFT_JACCARD_CAP, default 200): total candidate volume is
    ~O(cap · total-tokens-under-cap), i.e. linear in corpus size for a
    fixed cap, but the CONSTANT is the cap — 2000 was measured to spill
    this box's disk at the 5M-doc Zipf decade while 200 completes."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    cap = int(os.environ.get("SPARK_GRAFT_JACCARD_CAP", "200"))
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), max_prefix_df=cap
    )


def _jaccard_capped_w5(spark, sf_dir):
    """The capped posture at w=5 — the form that KEEPS recall on large
    corpora. Round-7 measurement: at 500k Zipf docs the w=3 capped form
    has recall ~0 (char-trigram space is bounded at |alphabet|^3, so no
    trigram is rare and the cap empties the prefix), while w=5 grows the
    gram space ~27^5 so rare grams exist for the rare-first prefix to
    keep. Cap from SPARK_GRAFT_JACCARD_CAP (default 200), as above.
    Measured cost (PERF.md round-7): 28.7 s at 50k Zipf docs, 464 s at
    500k (alpha 1.21 — superlinear, because the growing V5 keeps more
    grams under the cap as the corpus grows), box-disk-bounded at 5M;
    recall 0.999 at 500k. Keeping recall with the cap is not free —
    MinHash (q35) stays the corpus-scale production path."""
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs

    cap = int(os.environ.get("SPARK_GRAFT_JACCARD_CAP", "200"))
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), max_prefix_df=cap, ngram_w=5
    )


# Fixed merge list for the BPE apply probes: the 12 merges bpe_learn
# finds on the zipf 1x fixture (deterministic — argmax ties break
# lexically), hardcoded so the probe times APPLY alone, not learning
# (learning's decade curve is measured separately and is flat, PERF.md
# round-7).
_BPE_PROBE_MERGES = [
    ("a", "a"), ("aa", "a"), ("a", "b"), ("aaa", "b"), ("aa", "b"),
    ("a", "c"), ("aaa", "c"), ("aa", "c"), ("a", "d"), ("aaa", "d"),
    ("aa", "d"), ("a", "e"),
]


def _bpe_apply_fold(spark, sf_dir):
    """BPE tokenization, zero-shuffle fold form: k folds per word
    OCCURRENCE — measured exactly linear (corpus-bounded compute)."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.bpe import tokens_expr
    from anti_ddos_spark.queries.base import t

    return t(spark, sf_dir, "documents").select(
        F.size(tokens_expr(F.col("text"), _BPE_PROBE_MERGES)).alias("n")
    )


def _bpe_apply_vocab(spark, sf_dir):
    """BPE tokenization, V-bounded vocab-join form: k folds per DISTINCT
    word, mapping broadcast back — the 100 TB path (PERF.md decades:
    2.15/7.54/62.7 s vs the fold form's 13.4/135.7/~1350 s)."""
    from anti_ddos_spark.operators.bpe import bpe_tokenize_via_vocab
    from anti_ddos_spark.queries.base import t

    return bpe_tokenize_via_vocab(
        t(spark, sf_dir, "documents").select("doc_id", "text"),
        _BPE_PROBE_MERGES,
    )


EXTRA_PROBES = {
    "jaccard_w5": _jaccard_w5,
    "jaccard_capped": _jaccard_capped,
    "jaccard_capped_w5": _jaccard_capped_w5,
    "neardup_prod_params": _neardup_prod,
    "neardup_adaptive_params": _neardup_adaptive,
    "bpe_apply_fold": _bpe_apply_fold,
    "bpe_apply_vocab": _bpe_apply_vocab,
}


def build_10x(
    spark, out_dir: str, replicas: int, tables: set[str] | None = None
) -> None:
    from pyspark.sql import functions as F

    tables = tables or {"events", "documents", "embeddings"}
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("replica")

    if "events" in tables:
        _build_events(spark, out_dir, rep)
    if "documents" in tables:
        _build_documents(spark, out_dir, rep)
    if "embeddings" in tables:
        _build_embeddings(spark, out_dir, rep)


def _build_events(spark, out_dir: str, rep) -> None:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    u_span = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e_span = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        ev.select("*", rep)
        .select(
            (F.col("event_id") + F.col("replica") * e_span).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("replica") * u_span).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )


def _build_documents(spark, out_dir: str, rep) -> None:
    from pyspark.sql import functions as F

    doc = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    d_span = doc.agg(F.max("doc_id")).collect()[0][0] + 1
    # Replica tag on EVERY word, not a one-word prefix (round 9): a
    # single "r{k} " prefix left cross-replica twins at word-set
    # Jaccard ≈ 0.97 — far above q35's 0.71 banding threshold — so
    # duplicate-cluster SIZE grew with the replica count and the
    # candidate-pair census grew QUADRATICALLY in replicas (the bytes
    # axis caught it: 63× shuffle for 10× docs, PERF.md round 9),
    # violating this module's own "cross-replica pairs don't become
    # spurious near-dups" contract. Prefixing every word applies an
    # injective per-replica map to the vocabulary: within-replica
    # word-set relations (and thus the true near-dup pair set) are
    # preserved EXACTLY, while cross-replica word sets are disjoint.
    # The tag is FIXED-WIDTH ('r' + 3-digit replica) and applied to
    # every replica including 0: variable-width 'r'+k is not
    # prefix-free ('r1'+'2foo' == 'r12'+'foo'), and a verbatim replica
    # could collide with a tagged one on r-digit-leading words — with
    # equal-width tags, equal tagged words force equal replica ids for
    # any corpus over THIS FIXTURE'S ALPHABET (alphanumerics + spaces,
    # which the generated sf-fixture text is). It is NOT
    # corpus-independent: words() splits on non-alphanumerics, so a
    # token like '(foo' would become 'r000(foo' and re-split into
    # 'r000' + 'foo', re-sharing 'foo' across replicas and minting
    # shared bare 'rNNN' words (r9 ADVICE). A word delimiter would not
    # fix that either — 'r1_foo' re-splits the same way; a general
    # corpus would need normalization before tagging.
    tag = F.concat(F.lit("r"), F.lpad(F.col("replica").cast("string"), 3, "0"))
    # empty split tokens (leading/double spaces) are dropped, not tagged:
    # concat(tag, '') would MINT a shared 'r00k' word out of whitespace
    text10 = F.array_join(
        F.transform(
            F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) > 0),
            lambda w: F.concat(tag, w),
        ),
        " ",
    )
    (
        doc.select("*", rep)
        .select(
            (F.col("doc_id") + F.col("replica") * d_span).alias("doc_id"),
            text10.alias("text"),
            "lang",
            "source",
            F.length(text10).cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def _build_embeddings(spark, out_dir: str, rep) -> None:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    v_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # per-(replica, dimension) deterministic ±1: diagonal orthogonal map
    signed = F.expr(
        "transform(embedding, (x, i) -> x * cast(1 - 2 * pmod(xxhash64(replica, i), 2) as float))"
    )
    (
        emb.select("*", rep)
        .select(
            (F.col("vec_id") + F.col("replica") * v_span).alias("vec_id"),
            signed.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )


# --- Zipf/Heaps synthetic corpus (round-6 verdict task #4) ----------------
#
# The driver's documents fixture has a ~30-word vocabulary, so every
# token-space blocking lever (w=5 n-grams, prefix filters) saturates at
# the 100x decade for fixture reasons, not algorithmic ones (PERF.md
# "token-space saturation" — V stops growing, so candidate pairs per
# bucket grow ~n²/V). Real corpora obey Heaps' law: V(n) ≈ K·n^β with
# β ≈ 0.5. This generator produces a corpus with BOTH properties the
# claims live on:
#
# - Zipf-ish token frequencies: token rank drawn as
#   floor(exp(u · ln(Vmax))) for hash-uniform u — P(rank=r) ∝ 1/r
#   truncated at Vmax (classic inverse-CDF for s=1);
# - Heaps vocabulary growth: Vmax itself is set to
#   ceil(HEAPS_K · sqrt(expected total tokens)), so the attainable
#   vocabulary grows ~n^0.5 by construction and the Zipf draws populate
#   most of it.
#
# ~5% of docs are near-duplicates of their predecessor (same content
# seed, last 3 token slots re-drawn) so the similarity-join probes have
# real pairs to find at every scale. Everything is hash-seeded
# (xxhash64) — no RNG state, identical corpus on every run/executor.

ZIPF_TOKENS_MIN = 40
ZIPF_TOKENS_SPAN = 41  # doc length uniform in [40, 80]
HEAPS_K = 8.0
ZIPF_BASE_DOCS = 50_000  # scale 1.0 ≈ the sf0.1 documents row count


def build_zipf_documents(
    spark, out_dir: str, n_docs: int, graded: bool = False
) -> None:
    """``graded=False`` (default): every planted near-dup redraws its
    last 3 token slots — one high-similarity class, the recall-probe
    corpus (byte-identical to earlier rounds; determinism pinned in
    tests/test_zipf_fixture.py). ``graded=True``: the redraw count
    cycles over (2, 6, 12, 24, 40) by pair index, planting pairs whose
    TRUE word-set Jaccard spans ~0.2-0.95 — the fixture for measuring
    the MinHash banding s-curve empirically against its
    1-(1-s^r)^b theory (scripts/minhash_scurve.py)."""
    import math

    from pyspark.sql import functions as F

    exp_tokens = n_docs * (ZIPF_TOKENS_MIN + ZIPF_TOKENS_SPAN // 2)
    # 26**4: the fixed-width 4-letter encoding below caps the rank space
    vmax = min(456_976, max(1000, int(math.ceil(HEAPS_K * math.sqrt(exp_tokens)))))
    ln_vmax = math.log(vmax)

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # ~5% near-dups: doc_id % 20 == 19 reuses the previous doc's content
    # seed, with its last d token slots re-drawn from its own id
    content_id = F.when(
        (F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    n_toks = (
        F.lit(ZIPF_TOKENS_MIN)
        + F.pmod(F.xxhash64(content_id, F.lit("len")), F.lit(ZIPF_TOKENS_SPAN))
    ).cast("int")

    # token slot j: u = hash(seed, j)/2^20 in [0,1); rank = floor(e^(u·lnV)).
    # The rank is then spelled as a fixed-width base-26 LETTER word: the
    # q34 family shingles CHARACTERS, so a digit spelling ('t1234') would
    # cap V_char at ~12^w and silently re-saturate the very space this
    # corpus exists to grow. With letters, distinct char n-grams track
    # the word vocabulary (measured in the smoke check below the module).
    rank = (
        "cast(floor(exp((pmod(xxhash64({seed}, j), 1048576)"
        f" / 1048576.0d) * {ln_vmax!r})) as int)"
    )
    redraw = (
        "element_at(array(2, 6, 12, 24, 40), "
        "cast(pmod(doc_id div 20, 5) as int) + 1)"
        if graded
        else "3"
    )
    ranks = F.expr(
        "transform(sequence(0, n_toks - 1), j -> "
        f"CASE WHEN is_dup AND j >= n_toks - ({redraw}) "
        f"THEN {rank.format(seed='doc_id')} "
        f"ELSE {rank.format(seed='content_id')} END)"
    )
    tokens = F.expr(
        "transform(ranks, r -> concat("
        "char(97 + (r div 17576) % 26), char(97 + (r div 676) % 26), "
        "char(97 + (r div 26) % 26), char(97 + r % 26)))"
    )
    text = F.array_join(tokens, " ")
    (
        df.withColumn("content_id", content_id)
        .withColumn("is_dup", F.col("doc_id") != F.col("content_id"))
        .withColumn("n_toks", n_toks)
        .withColumn("ranks", ranks)
        .withColumn("text", text)
        .select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.concat(
                F.lit("zipf"), F.pmod(F.xxhash64("content_id"), F.lit(10))
            ).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


# --- graded-cosine embedding fixture (round-8: r7 verdict task #4) --------
#
# The MinHash family got its s-curve measured in round 7; the embedding
# family (hyperplane-LSH q42/q44, SemDeDup q51) still rested on
# planted-CLUSTER units, which only exercise the s≈1 corner. This
# builder plants PAIRS at graded target cosines so detection can be
# measured across the whole curve against Charikar's sign-bit theory
# (P[one plane agrees] = 1 - θ/π). Construction per planted pair
# (vec_id % 20 == 19 pairs with vec_id - 1, the documents convention):
#
#   b = s · â  +  sqrt(1 - s²) · ŵ⊥
#
# where â is the partner's unit vector and ŵ⊥ a fresh Gaussian
# orthogonalized against â — so cos(a, b) = s EXACTLY (up to float),
# not merely in expectation. Gaussians are hash-seeded Box-Muller
# (xxhash64 → uniform → sqrt(-2 ln u1)·cos(2π u2)): no RNG state,
# identical fixture on every run/executor, fully columnar.

EMBED_GRADES = (0.50, 0.70, 0.80, 0.90, 0.95, 0.99)
EMBED_DIM = 32


def build_graded_embeddings(
    spark, out_dir: str, n_vectors: int, dim: int = EMBED_DIM
) -> None:
    import math

    from pyspark.sql import functions as F

    def gauss(seed_col: str, salt: str) -> str:
        """array<double> of `dim` hash-seeded standard normals."""
        u = (
            f"(pmod(xxhash64({seed_col}, '{salt}', j), 1048575) + 1) "
            "/ 1048576.0d"
        )
        u2 = (
            f"(pmod(xxhash64({seed_col}, '{salt}2', j), 1048576)) "
            "/ 1048576.0d"
        )
        return (
            f"transform(sequence(0, {dim - 1}), j -> "
            f"sqrt(-2.0d * ln({u})) * cos({2 * math.pi!r} * {u2}))"
        )

    grades = ", ".join(repr(g) for g in EMBED_GRADES)
    raw_path = os.path.join(out_dir, "_raw_gauss.parquet")
    # STAGE 1 — materialize the raw hash-Gaussians. The derivation below
    # nests â inside ŵ⊥ inside b; Catalyst collapses projections by
    # substitution, so if g/w were still the (large) hash expressions
    # the codegen tree would blow up exponentially (measured: Java-heap
    # OOM at 20k×32). With g/w as READ columns the nesting is a few
    # hundred ops.
    (
        spark.range(n_vectors)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "is_pair",
            (F.col("vec_id") % 20 == 19) & (F.col("vec_id") > 0),
        )
        .withColumn(
            "base_id",
            F.when(F.col("is_pair"), F.col("vec_id") - 1).otherwise(
                F.col("vec_id")
            ),
        )
        .withColumn("g", F.expr(gauss("base_id", "base")))
        .withColumn("w", F.expr(gauss("vec_id", "w")))
        .withColumn(
            "s",
            F.expr(
                f"element_at(array({grades}), "
                "cast(pmod(vec_id div 20, "
                f"{len(EMBED_GRADES)}) as int) + 1)"
            ),
        )
        .select("vec_id", "is_pair", "g", "w", "s")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(raw_path)
    )
    # STAGE 2 — b = s·â + √(1-s²)·ŵ⊥ from materialized columns
    df = spark.read.parquet(raw_path)
    unit = "transform({v}, x -> x / sqrt(aggregate({v}, 0.0d, (acc, y) -> acc + y * y)))"
    a_hat = unit.format(v="g")
    w_dot_a = f"aggregate(zip_with(w, {a_hat}, (wi, ai) -> wi * ai), 0.0d, (acc, y) -> acc + y)"
    w_perp = f"zip_with(w, {a_hat}, (wi, ai) -> wi - ({w_dot_a}) * ai)"
    w_hat = unit.format(v=f"({w_perp})")
    paired = (
        f"zip_with({a_hat}, {w_hat}, "
        "(ai, wi) -> s * ai + sqrt(1.0d - s * s) * wi)"
    )
    emb = F.when(F.col("is_pair"), F.expr(paired)).otherwise(
        F.expr(a_hat)
    )
    (
        df.withColumn("emb", emb)
        .select(
            "vec_id",
            F.expr("transform(emb, x -> cast(x as float))").alias(
                "embedding"
            ),
            F.when(F.col("is_pair"), F.col("s"))
            .otherwise(F.lit(None))
            .alias("target_cos"),
        )
        .withColumn("label", F.lit("graded"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    import shutil

    shutil.rmtree(raw_path, ignore_errors=True)


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*df.columns))).collect()
        return time.perf_counter() - t0

    once()  # warm: codegen + AQE plan at this size
    return min(once() for _ in range(runs))


# --- engine-invariant byte metrics (round 9, r8 verdict task #5) -----------
#
# The decade blocks' wall clock is page-cache-state bound at 100x (the
# identical-code spread measured 86.8-125.7 s in r8), so BENCH_SCALE
# blocks also record bytes READ and shuffle bytes WRITTEN per query —
# deterministic functions of the plan and data, immune to cache state —
# via the Spark status REST API (the session must be built with
# spark.ui.enabled=true; bench.py's decade runners do).


def _rest(spark, path: str):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/{path}", timeout=10
    ) as r:
        return json.load(r)


def stage_totals(spark) -> dict[str, int]:
    """Sum shuffle bytes across all completed stages so far. (Stage
    ``inputBytes`` is NOT summed: with the vectorized parquet reader on
    file:// it underreports ~100× — measured 193 KB for a 21 MB full
    scan — because the Hadoop FileSystem.Statistics the metric reads
    are not fed by that path; scan bytes come from the SQL-execution
    metrics instead, ``sql_scan_bytes``.)"""
    stages = _rest(spark, "stages?status=complete")
    if stages is None:
        return {}
    out = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0}
    for s in stages:
        out["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        out["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
    return out


_SIZE_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_size(s: str) -> float:
    parts = s.strip().split()
    if len(parts) == 2 and parts[1] in _SIZE_UNITS:
        return float(parts[0]) * _SIZE_UNITS[parts[1]]
    try:
        return float(s.replace(",", ""))
    except ValueError:
        return 0.0


def _sql_execs(spark, query: str) -> list:
    """Page the SQL REST endpoint to exhaustion (r9 ADVICE: a fixed
    length=1000 window truncates once the UI retains more executions
    than one page — bench.py now raises retainedExecutions, which makes
    single-page reads WORSE, not better, without this)."""
    out, offset, page = [], 0, 1000
    while True:
        batch = _rest(spark, f"sql?{query}&offset={offset}&length={page}") or []
        out.extend(batch)
        if len(batch) < page:
            return out
        offset += page


def max_sql_id(spark) -> int:
    execs = _sql_execs(spark, "details=false")
    return max((e["id"] for e in execs), default=-1)


def sql_scan_bytes(spark, after_id: int) -> int:
    """Sum 'size of files read' over SQL executions newer than
    ``after_id`` — the scan's own metric, correct where stage
    inputBytes is not."""
    execs = _sql_execs(spark, "details=true&planDescription=false")
    total = 0.0
    for e in execs:
        if e["id"] <= after_id:
            continue
        for n in e.get("nodes", []):
            for m in n.get("metrics", []):
                if m["name"] == "size of files read":
                    total += _parse_size(m["value"])
    return int(total)


def time_query_with_bytes(spark, fn, sf_dir: str, runs: int) -> dict:
    """``time_query`` + the byte axis: min-of-runs seconds (steady-state
    wall clock) and the LAST run's byte deltas (bytes are plan-determined
    and run-invariant, so any run's delta is the number)."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*df.columns))).collect()
        return time.perf_counter() - t0

    once()  # warm: codegen + AQE plan at this size
    secs = [once() for _ in range(max(runs - 1, 0))]
    before = stage_totals(spark)
    sql_before = max_sql_id(spark)
    secs.append(once())
    after = stage_totals(spark)
    rec = {"sec": round(min(secs), 3)}
    if before and after:
        rec["input_mb"] = round(sql_scan_bytes(spark, sql_before) / 1e6, 2)
        for k in before:
            rec[k.replace("_bytes", "_mb")] = round(
                (after[k] - before[k]) / 1e6, 2
            )
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scales",
        default="10",
        help="comma list of replica factors to build and probe (e.g. 10,100)",
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma subset of probes (default: all flagship probes)",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma subset of tables to replicate (default: all three)",
    )
    ap.add_argument("--keep", action="store_true", help="keep the scale dirs")
    ap.add_argument(
        "--fixture",
        default="replica",
        choices=("replica", "zipf"),
        help="replica: id-remapped replication of sf0.1 (default). "
        "zipf: generated Heaps/Zipf corpus (documents only); --scales "
        "are then multiples of 50k docs (0.1,1,10,100)",
    )
    args = ap.parse_args()
    scales = [float(s) if "." in s else int(s) for s in args.scales.split(",")]

    from anti_ddos_spark.queries import full_registry
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = full_registry()

    if args.fixture == "zipf":
        # zipf dirs carry only documents; default to the token-space
        # probes whose saturation story the corpus exists to re-test.
        # The exact recall-1 forms (q34, jaccard_w5) are NOT defaults at
        # 100x: their n²/V candidate floor spills the disk at 5M Zipf
        # docs (measured) — probe them explicitly with --queries at the
        # scales you can afford.
        probes = [
            ("q35_minhash_prod", reg["q35_minhash_prod"].fn),
            ("jaccard_capped", EXTRA_PROBES["jaccard_capped"]),
        ]
    else:
        probes = [(n, reg[n].fn) for n in PROBE_QUERIES] + list(EXTRA_PROBES.items())
    if args.queries:
        wanted = set(args.queries.split(","))
        # any extra probe or full_registry query can be requested by
        # name, not only the mode's default set (zipf mode defaults
        # exclude the exact recall-1 forms, but probing them at chosen
        # scales is exactly what --queries is for)
        pool = dict(probes)
        pool.update(EXTRA_PROBES)
        unknown = wanted - set(pool) - set(reg)
        if unknown:
            # fail BEFORE the expensive replica build: a typo'd name
            # would otherwise probe nothing and exit 0
            raise SystemExit(f"unknown probe/query names: {sorted(unknown)}")
        probes = [(n, pool[n]) for n in sorted(wanted & set(pool))] + [
            (n, reg[n].fn) for n in sorted(wanted - set(pool))
        ]

    tables = set(args.tables.split(",")) if args.tables else None
    scale_dirs: list[tuple[float, str]] = []
    for rep in scales:
        if args.fixture == "zipf":
            out_dir = os.path.join(tempfile.gettempdir(), f"zipf_{rep}x")
            if not os.path.exists(
                os.path.join(out_dir, "documents.parquet", "_SUCCESS")
            ):
                build_zipf_documents(spark, out_dir, int(rep * ZIPF_BASE_DOCS))
        else:
            out_dir = os.path.join(tempfile.gettempdir(), f"scale_{rep}x")
            build_10x(spark, out_dir, int(rep), tables)
        scale_dirs.append((rep, out_dir))
    import math

    results: dict[str, dict[str, float]] = {}
    for name, fn in probes:
        # (label, replica factor relative to sf0.1, seconds)
        # zipf mode has no sf0.01/sf0.1 anchors: corpus statistics must
        # be consistent along the whole curve, so every point is generated
        suffix = "zipf" if args.fixture == "zipf" else "sf0.1"
        specs = (
            []
            if args.fixture == "zipf"
            else [("sf0.01", 0.1, SF001), ("sf0.1", 1.0, SF01)]
        ) + [(f"{rep}x_{suffix}", float(rep), d) for rep, d in scale_dirs]
        # time + print each point AS IT COMPLETES: a late-scale abort
        # (disk spill at 100x is a real outcome this probe exists to
        # find) must not lose the earlier decades' measurements
        points = []
        for lbl, factor, d in specs:
            secs = time_query(spark, fn, d, args.runs)
            print(
                json.dumps({"query": name, "point": lbl, "sec": round(secs, 3)}),
                flush=True,
            )
            points.append((lbl, factor, secs))
        r = {lbl: secs for lbl, _f, secs in points}
        # per-adjacent-interval exponent, normalized per decade
        for (l0, f0, t0), (l1, f1, t1) in zip(points, points[1:]):
            r[f"alpha({l0}->{l1})"] = round(
                math.log(t1 / t0) / math.log(f1 / f0), 3
            )
        results[name] = {k: round(v, 3) for k, v in r.items()}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    print(json.dumps({"summary": results}))
    if not args.keep:
        for _rep, d in scale_dirs:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
