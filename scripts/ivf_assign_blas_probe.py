"""Expression vs BLAS assignment scoring at 1M x 256 (r10 verdict
task #5).

The r10 narrow-assignment fix removed the payload-wide shuffle flaw
(831 -> 166 s build at 1M vectors / dim 32 / 256 cells); the remaining
cost is per-element Catalyst cosine over arrays (n x k aggregate/
zip_with evaluations). This probe times the same build with
_assign_cells' "blas" scoring — one numpy matmul per Arrow batch
inside mapInPandas (the adjudicated vectorized exception class) — and
verifies the assignments are BYTE-IDENTICAL (same (cos desc, cid asc)
ordering) before quoting any speedup.

Method per the measurement discipline: quiet box, assignment-only
stage timed as count() on the narrow assign frame (isolates scoring
from the partitioned write), then the full ivf_build_index wall;
run 2 passes per engine and keep the best.

Usage: python scripts/ivf_assign_blas_probe.py [--vectors 1000000]
       [--dim 32] [--cells 256] [--nprobe 1]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=1)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from anti_ddos_spark.operators import similarity as S
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="ivf_assign_blas_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic md5-derived vectors (ivf_maint_probe's fixture)
    comp = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("vec_id"), F.lit(f"-{j}"))), 1, 8
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**8))
            - F.lit(0.5)
        ).alias(f"c{j}")
        for j in range(args.dim)
    ]
    base = (
        spark.range(args.vectors)
        .select(F.col("id").alias("vec_id"), *comp)
        .select(
            "vec_id",
            F.array(*[F.col(f"c{j}") for j in range(args.dim)]).alias(
                "embedding"
            ),
        )
        .cache()
    )
    base.count()
    cents = (
        base.filter(F.col("vec_id") < args.cells)
        .select(
            F.col("vec_id").alias("cid"),
            S.as_double(F.col("embedding")).alias("cvec"),
        )
        .cache()
    )
    cents.count()

    def assign_wall(scoring: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            S._assign_cells(
                base, cents, args.nprobe, "vec_id", "embedding",
                scoring=scoring,
            ).select("vec_id", "centroid_id").agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("vec_id", "centroid_id"))
            ).collect()
            best = min(best, time.time() - t0)
        return best

    expr_s = assign_wall("expr")
    blas_s = assign_wall("blas")

    # byte-identity of the assignments (hash over every (id, cell) row)
    def assign_hash(scoring: str):
        return (
            S._assign_cells(
                base, cents, args.nprobe, "vec_id", "embedding",
                scoring=scoring,
            )
            .select("vec_id", "centroid_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("vec_id", "centroid_id")).alias("h"),
            )
            .collect()[0]
        )

    ha, hb = assign_hash("expr"), assign_hash("blas")
    identical = (ha["n"], ha["h"]) == (hb["n"], hb["h"])

    # full build wall (assignment + partitioned write), best-of-runs
    def build_wall(scoring: str) -> float:
        prev = S.IVF_ASSIGN_SCORING
        S.IVF_ASSIGN_SCORING = scoring
        best = float("inf")
        try:
            for _ in range(args.runs):
                path = tempfile.mkdtemp(prefix=f"ivf_blas_{scoring}_")
                idx = os.path.join(path, "inc")
                t0 = time.time()
                S.ivf_build_index(
                    base, idx, n_centroids=args.cells, centroids="data",
                    membership_nprobe=args.nprobe,
                )
                best = min(best, time.time() - t0)
                shutil.rmtree(path, ignore_errors=True)
        finally:
            S.IVF_ASSIGN_SCORING = prev
        return best

    build_expr = build_wall("expr")
    build_blas = build_wall("blas")

    print(
        {
            "vectors": args.vectors,
            "dim": args.dim,
            "cells": args.cells,
            "nprobe": args.nprobe,
            "assign_expr_s": round(expr_s, 1),
            "assign_blas_s": round(blas_s, 1),
            "assign_speedup": round(expr_s / blas_s, 2),
            "build_expr_s": round(build_expr, 1),
            "build_blas_s": round(build_blas, 1),
            "build_speedup": round(build_expr / build_blas, 2),
            "assignments_identical": identical,
            "rows": ha["n"],
        }
    )


if __name__ == "__main__":
    main()
