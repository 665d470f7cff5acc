"""Empirical MinHash-LSH s-curve vs theory (round 7).

The engine's production constants (MINHASH_K=128, LSH_BANDS=16 → r=8
rows/band, threshold s* = (1/b)^(1/r) ≈ 0.71) are cited across q32/q35
and the streaming bucket dedup, but the s-curve itself had never been
MEASURED — every prior fixture planted only near-identical pairs, which
exercise the s≈1 corner of the curve.

`scale_probe.build_zipf_documents(graded=True)` plants pairs whose last
d ∈ (2, 6, 12, 24, 40) token slots are re-drawn, spanning true word-set
Jaccard ~0.2-0.95. This script computes, per planted pair:

- its TRUE word-set Jaccard (exact array_intersect/array_union — the
  same similarity the banding theory is stated over);
- whether q35's production banding surfaced it as a candidate.

It then buckets pairs by similarity and prints measured detection rate
next to the collision theory p(s) = 1 - (1 - s^r)^b. Agreement pins
that the signature pipeline (one base hash per shingle → k universal
permutations → b band digests) implements the theory it cites; the
measured s* crossover is the empirical "threshold ≈ 0.71".

Note the theory's s is SHINGLE-set Jaccard (3-word shingles) while the
verify column is word-set Jaccard; for redraw-suffix pairs shingle
similarity sits slightly below word similarity (a d-token redraw breaks
d+2 shingles), so the measured curve should sit a touch LEFT of theory
when plotted against word Jaccard — the script prints both simil
measures per bucket so the shift is visible rather than mysterious.

Usage: python scripts/minhash_scurve.py [--n-docs 50000] [--dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--dir", default="/tmp/zipf_scurve")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import scale_probe
    from anti_ddos_spark.config import LSH_BANDS, MINHASH_K
    from anti_ddos_spark.operators.dedup import (
        minhash_candidates,
        shingles_of_words,
        words,
    )
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="minhash_scurve")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(args.dir, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        scale_probe.build_zipf_documents(
            spark, args.dir, n_docs=args.n_docs, graded=True
        )
    docs = spark.read.parquet(doc_path)

    planted = docs.filter(
        (F.pmod("doc_id", F.lit(20)) == 19) & (F.col("doc_id") > 0)
    ).select((F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b"))

    # both similarity spaces: word-set Jaccard (the q35 verify column)
    # and SHINGLE-set Jaccard (the space the banding theory is stated
    # over — signatures are MinHashes of the 3-word shingle set)
    wsets = docs.select(
        "doc_id",
        F.array_distinct(words(F.col("text"))).alias("wset"),
        F.array_distinct(
            shingles_of_words(words(F.col("text")), F.col("text"))
        ).alias("shset"),
    )
    truth = (
        planted.join(
            wsets.select(
                F.col("doc_id").alias("id_a"),
                F.col("wset").alias("wa"),
                F.col("shset").alias("sa"),
            ),
            "id_a",
        )
        .join(
            wsets.select(
                F.col("doc_id").alias("id_b"),
                F.col("wset").alias("wb"),
                F.col("shset").alias("sb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("wa", "wb"))
                / F.size(F.array_union("wa", "wb"))
            ).alias("jac"),
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("sjac"),
        )
    )
    found = minhash_candidates(docs).select(
        "id_a", "id_b", F.lit(1).alias("hit")
    )
    r = MINHASH_K // LSH_BANDS
    per_bucket = (
        truth.join(found, ["id_a", "id_b"], "left")
        .select(
            (F.floor(F.col("sjac") * 10) / 10).alias("s_bucket"),
            F.col("jac"),
            F.col("sjac"),
            F.coalesce("hit", F.lit(0)).alias("hit"),
        )
        .groupBy("s_bucket")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.avg("jac").alias("mean_word_s"),
            F.avg("sjac").alias("mean_shingle_s"),
            F.avg("hit").alias("detect_rate"),
        )
        .orderBy("s_bucket")
        .collect()
    )
    for row in per_bucket:
        s = row["mean_shingle_s"]
        theory = 1 - (1 - s**r) ** LSH_BANDS
        print(
            json.dumps(
                {
                    "shingle_s_bucket": row["s_bucket"],
                    "pairs": row["pairs"],
                    "mean_shingle_jaccard": round(s, 4),
                    "mean_word_jaccard": round(row["mean_word_s"], 4),
                    "measured_detect": round(row["detect_rate"], 4),
                    "theory_at_shingle_s": round(theory, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
