"""Empirical embedding-LSH recall s-curve vs theory (round 8).

Round 7 gave MinHash the planted-ground-truth treatment and it changed
a conclusion; the embedding family (hyperplane-LSH q42/q44, SemDeDup
q51) still rested on planted-cluster units that only exercise the s≈1
corner (r7 verdict task #4). This probe measures detection across the
WHOLE similarity curve on `scale_probe.build_graded_embeddings`, which
plants pairs at EXACT graded cosines s ∈ {0.5, 0.7, 0.8, 0.9, 0.95,
0.99} (construction b = s·â + √(1-s²)·ŵ⊥, so cos(a,b) = s up to
float32, verified per pair).

Per grade, three detection mechanisms against their theory. For one
Gaussian hyperplane, P[sign agrees] = 1 - θ/π with θ = acos(s)
(Charikar STOC'02):

- banded candidate generation (the q42 shape, b bands × k planes):
  detect iff sigs match in ≥1 band; theory 1 - (1 - p^k)^b;
- multi-probe single-band (the q44 shape, 16 planes, Hamming ≤ 1):
  detect iff popcount(sig_a XOR sig_b) ≤ 1; theory
  p^16 + 16·p^15·(1-p);
- SemDeDup cluster bounding (the q51 shape): candidate iff both land
  in the same k-means cell — no closed-form theory (depends on the
  learned partition); the measured same-cell rate per grade IS the
  family's recall ceiling, reported next to the flag rate at τ=0.9.

Also prints the `config.lsh_planes_for` occupancy check: bucket space
sized for target occupancy 32 → measured mean occupancy should sit
near the target (the sizing rule's whole claim).

Usage: python scripts/embed_scurve.py [--n-vectors 100000] [--dir ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

BANDS, PLANES_PER_BAND = 8, 8  # banded form: 64 Gaussian planes
ANN_PLANES, ANN_HAMMING = 16, 1  # q44's production constants
SEMDEDUP_TAU = 0.9


def plane_agree_p(s: float) -> float:
    return 1.0 - math.acos(max(-1.0, min(1.0, s))) / math.pi


def banded_theory(s: float, bands: int = BANDS, k: int = PLANES_PER_BAND) -> float:
    p = plane_agree_p(s)
    return 1.0 - (1.0 - p**k) ** bands


def multiprobe_theory(s: float, n: int = ANN_PLANES, hamming: int = ANN_HAMMING) -> float:
    p = plane_agree_p(s)
    return sum(
        math.comb(n, d) * p ** (n - d) * (1 - p) ** d
        for d in range(hamming + 1)
    )


def planted_pairs(emb):
    """(id_a, id_b, target_cos) for the fixture's planted pairs."""
    from pyspark.sql import functions as F

    return emb.filter(F.col("target_cos").isNotNull()).select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        "target_cos",
    )


def pair_side(df, cols: dict, side: str):
    from pyspark.sql import functions as F

    return df.select(
        F.col("vec_id").alias(f"id_{side}"),
        *[F.col(c).alias(f"{a}_{side}") for c, a in cols.items()],
    )


def measure_scurve(spark, emb):
    """Per-grade detection rates for all three mechanisms; returns a
    list of dict rows (shared by the script and test_embed_recall)."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.similarity import (
        assign_to_centroids,
        hyperplane_signatures,
        kmeans_train,
    )

    pairs = planted_pairs(emb).cache()

    # banded: one signature build, pair detection = ≥1 matching band sig
    sig = hyperplane_signatures(
        emb, BANDS, PLANES_PER_BAND, planes="gaussian"
    ).select("vec_id", "band_id", "sig")
    band_match = (
        pairs.join(pair_side(sig, {"band_id": "band", "sig": "sig"}, "a"), "id_a")
        .join(pair_side(sig, {"band_id": "band", "sig": "sig"}, "b"), "id_b")
        .filter(F.col("band_a") == F.col("band_b"))
        .groupBy("id_a", "id_b", "target_cos")
        .agg(
            F.max((F.col("sig_a") == F.col("sig_b")).cast("int")).alias(
                "banded_hit"
            )
        )
    )

    # multiprobe: single 16-plane band, detect = hamming(sig_a, sig_b) ≤ 1
    sig1 = hyperplane_signatures(
        emb, 1, ANN_PLANES, planes="gaussian"
    ).select("vec_id", "sig")
    probe = (
        pairs.join(pair_side(sig1, {"sig": "sig"}, "a"), "id_a")
        .join(pair_side(sig1, {"sig": "sig"}, "b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.bit_count(
                    F.col("sig_a").bitwiseXOR(F.col("sig_b"))
                )
                <= ANN_HAMMING
            )
            .cast("int")
            .alias("probe_hit"),
        )
    )

    # SemDeDup: learned k-means cells; candidate iff same cell. k is
    # capped at 16: kmeans_train's farthest-point seeding nests k
    # least()/fold expressions (codegen grows ~k²·dim — a Java-heap OOM
    # at k≈40 on this box), and the probe only needs the same-cell
    # rate, which 16 cells over ≥4k vectors already makes selective.
    n = emb.count()
    k_cells = max(8, min(16, int(round(n / 1024))))
    cents, _ = kmeans_train(emb, k=k_cells)
    from pyspark.sql import Window as W

    from anti_ddos_spark.operators.similarity import (
        _literal_centroids,
        as_double,
        cosine,
    )

    # top-2 cells per vector (the operator's nprobe path, mirrored):
    # primary-cell hit = the single-cell recall ceiling; any-shared-
    # probed-cell hit = the nprobe=2 recovery
    cdf = _literal_centroids(spark, cents)
    scored = (
        emb.select("vec_id", as_double(F.col("embedding")).alias("e"))
        .crossJoin(F.broadcast(cdf))
        .select(
            "vec_id",
            F.col("cid"),
            cosine(F.col("e"), F.col("cvec")).alias("_ccos"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("_ccos"), F.asc("cid"))
    ranked = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= 2
    )
    primary = ranked.filter(F.col("_rn") == 1).select("vec_id", "cid")
    probed = ranked.select("vec_id", "cid")
    cell = (
        pairs.join(pair_side(primary, {"cid": "cid"}, "a"), "id_a")
        .join(pair_side(primary, {"cid": "cid"}, "b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("cid_a") == F.col("cid_b")).cast("int").alias("cell_hit"),
        )
    )
    probe2 = (
        pairs.join(pair_side(probed, {"cid": "cid"}, "a"), "id_a")
        .join(pair_side(probed, {"cid": "cid"}, "b"), "id_b")
        .groupBy("id_a", "id_b")
        .agg(
            F.max(
                (F.col("cid_a") == F.col("cid_b")).cast("int")
            ).alias("probe2_hit")
        )
    )

    rows = (
        band_match.join(probe, ["id_a", "id_b"])
        .join(cell, ["id_a", "id_b"])
        .join(probe2, ["id_a", "id_b"])
        .groupBy("target_cos")
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.avg("banded_hit").alias("banded_detect"),
            F.avg("probe_hit").alias("probe_detect"),
            F.avg("cell_hit").alias("same_cell"),
            F.avg("probe2_hit").alias("same_cell_nprobe2"),
        )
        .orderBy("target_cos")
        .collect()
    )
    out = []
    for r in rows:
        s = float(r["target_cos"])
        out.append(
            {
                "target_cos": s,
                "pairs": r["pairs"],
                "banded_detect": round(r["banded_detect"], 4),
                "banded_theory": round(banded_theory(s), 4),
                "probe_detect": round(r["probe_detect"], 4),
                "probe_theory": round(multiprobe_theory(s), 4),
                "same_cell": round(r["same_cell"], 4),
                "same_cell_nprobe2": round(r["same_cell_nprobe2"], 4),
                "semdedup_flag_eligible": s >= SEMDEDUP_TAU,
                "k_cells": k_cells,
            }
        )
    return out


def measure_occupancy(spark, emb):
    """config.lsh_planes_for sizing check: mean bucket occupancy at the
    sized plane count vs the target."""
    from pyspark.sql import functions as F

    from anti_ddos_spark.config import lsh_planes_for
    from anti_ddos_spark.operators.similarity import hyperplane_signatures

    n = emb.count()
    target = 32
    planes = lsh_planes_for(n, target_occupancy=target)
    sig = hyperplane_signatures(emb, 1, planes, planes="gaussian")
    occ = (
        sig.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.avg("n").alias("mean"),
            F.expr("percentile_approx(n, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("buckets"),
        )
        .collect()[0]
    )
    return {
        "n_vectors": n,
        "sized_planes": planes,
        "target_occupancy": target,
        "mean_occupancy": round(occ["mean"], 2),
        "p99_occupancy": int(occ["p99"]),
        "nonempty_buckets": occ["buckets"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vectors", type=int, default=100_000)
    ap.add_argument("--dir", default="/tmp/graded_embeddings")
    args = ap.parse_args()

    import scale_probe
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="embed_scurve")
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(args.dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scale_probe.build_graded_embeddings(
            spark, args.dir, n_vectors=args.n_vectors
        )
    emb = spark.read.parquet(path)

    for row in measure_scurve(spark, emb):
        print(json.dumps(row), flush=True)
    print(json.dumps(measure_occupancy(spark, emb)), flush=True)


if __name__ == "__main__":
    main()
