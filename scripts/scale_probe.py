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


EXTRA_PROBES = {
    "jaccard_w5": _jaccard_w5,
    "neardup_prod_params": _neardup_prod,
    "neardup_adaptive_params": _neardup_adaptive,
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
    text10 = F.concat(F.lit("r"), F.col("replica").cast("string"), F.lit(" "), F.col("text"))
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


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*df.columns))).collect()
        return time.perf_counter() - t0

    once()  # warm: codegen + AQE plan at this size
    return min(once() for _ in range(runs))


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
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from anti_ddos_spark.queries import full_registry
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = full_registry()

    probes = [(n, reg[n].fn) for n in PROBE_QUERIES] + list(EXTRA_PROBES.items())
    if args.queries:
        wanted = set(args.queries.split(","))
        known = {n for n, _fn in probes}
        unknown = wanted - known - set(reg)
        if unknown:
            # fail BEFORE the expensive replica build: a typo'd name
            # would otherwise probe nothing and exit 0
            raise SystemExit(f"unknown probe/query names: {sorted(unknown)}")
        # any full_registry query can be probed by name, not only the
        # flagship set
        probes = [(n, fn) for n, fn in probes if n in wanted] + [
            (n, reg[n].fn) for n in sorted(wanted - known) if n in reg
        ]

    tables = set(args.tables.split(",")) if args.tables else None
    scale_dirs: list[tuple[int, str]] = []
    for rep in scales:
        out_dir = os.path.join(tempfile.gettempdir(), f"scale_{rep}x")
        build_10x(spark, out_dir, rep, tables)
        scale_dirs.append((rep, out_dir))
    import math

    results: dict[str, dict[str, float]] = {}
    for name, fn in probes:
        # (label, replica factor relative to sf0.1, seconds)
        points = [
            ("sf0.01", 0.1, time_query(spark, fn, SF001, args.runs)),
            ("sf0.1", 1.0, time_query(spark, fn, SF01, args.runs)),
        ] + [
            (f"{rep}x_sf0.1", float(rep), time_query(spark, fn, d, args.runs))
            for rep, d in scale_dirs
        ]
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
