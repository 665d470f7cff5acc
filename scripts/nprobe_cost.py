"""Cost of the SemDeDup nprobe=2 quality default (round 9, VERDICT r8 #3).

nprobe=2 became the QUALITY_DEFAULTS posture this round (measured +0.22
recall at s=0.95). The recall side is pinned by the s-curve and q134;
this probe records the COST side at the oracle SF and one decade up:
wall clock and membership rows (the candidate-join input — the number
that actually scales) for nprobe=1 vs nprobe=2 at q51's configuration.

Usage: python scripts/nprobe_cost.py [--dirs sf0.01,sf0.1,10x]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "10x": os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/spark_graft_10x"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="sf0.01,sf0.1,10x")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from anti_ddos_spark.operators.similarity import (
        as_double,
        cosine,
        semantic_dedup_flags,
    )
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="nprobe_cost")
    spark.sparkContext.setLogLevel("ERROR")

    for label in args.dirs.split(","):
        d = DIRS[label]
        path = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(path):
            print(json.dumps({"dir": label, "skipped": "no embeddings"}))
            continue
        emb = spark.read.parquet(path)
        n = emb.count()
        for nprobe in (1, 2):
            # membership rows = the candidate-join input size (the
            # top-nprobe cells per vector, mirroring the operator)
            e = emb.select(
                "vec_id", as_double(F.col("embedding")).alias("e")
            )
            cents = e.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("e").alias("cvec"),
            )
            w = W.partitionBy("vec_id").orderBy(
                F.desc("c"), F.asc("centroid_id")
            )
            memb = (
                e.crossJoin(F.broadcast(cents))
                .select(
                    "vec_id", "centroid_id",
                    cosine(F.col("e"), F.col("cvec")).alias("c"),
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= nprobe)
                .count()
            )

            def once() -> float:
                t0 = time.perf_counter()
                df = semantic_dedup_flags(
                    emb, n_centroids=8, tau=0.2, centroids="data",
                    nprobe=nprobe,
                )
                df.agg(
                    F.count(F.lit(1)), F.sum("kept")
                ).collect()
                return time.perf_counter() - t0

            once()
            sec = min(once() for _ in range(args.runs))
            print(
                json.dumps(
                    {
                        "dir": label, "vectors": n, "nprobe": nprobe,
                        "membership_rows": memb,
                        "sec": round(sec, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
