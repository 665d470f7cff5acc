"""IVF index maintenance probe (round 10): incremental
ivf_apply_changes vs full rebuild, on wall clock AND files-touched.

The claim to pin: a small retraction-form change batch costs O(touched
cells + batch) — the untouched cells' files are never read or written —
while a rebuild re-assigns and rewrites the whole corpus. The gap is
the corpus/touched ratio, so it widens linearly with index size at a
fixed change rate.

Usage: python scripts/ivf_maint_probe.py [--vectors 100000 --dim 32
       --cells 32 --changes 64]
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


def _cell_files(path: str) -> dict[str, set]:
    out: dict[str, set] = {}
    for d in os.listdir(path):
        if d.startswith("centroid_id="):
            out[d] = {
                f
                for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("--changes", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.similarity import (
        ivf_apply_changes,
        ivf_build_index,
    )
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="ivf_maint_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic pseudo-random unit vectors: md5-derived components
    # (no RNG dependency, reproducible across runs)
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
    )
    base = base.cache()
    base.count()

    root = tempfile.mkdtemp(prefix="ivf_maint_")
    inc = os.path.join(root, "inc")
    t0 = time.time()
    ivf_build_index(
        base, inc, n_centroids=args.cells, centroids="data",
        membership_nprobe=1,
    )
    build_s = time.time() - t0
    before = _cell_files(inc)

    # change batch: updates take a neighbor's vector, plus deletes and
    # fresh inserts — changes/3 of each
    k = args.changes // 3
    upd_ids = list(range(100, 100 + k))
    del_ids = list(range(5000, 5000 + k))
    upd_old = base.filter(F.col("vec_id").isin(upd_ids))
    upd_new = (
        base.filter(F.col("vec_id").isin([i + 1 for i in upd_ids]))
        .select((F.col("vec_id") - 1).alias("vec_id"), "embedding")
    )
    dele = base.filter(F.col("vec_id").isin(del_ids))
    ins = base.filter(F.col("vec_id").isin(list(range(200, 200 + k)))).select(
        (F.col("vec_id") + args.vectors).alias("vec_id"), "embedding"
    )
    changes = (
        dele.withColumn("_op", F.lit("D"))
        .unionByName(upd_old.withColumn("_op", F.lit("U-")))
        .unionByName(upd_new.withColumn("_op", F.lit("U+")))
        .unionByName(ins.withColumn("_op", F.lit("I")))
    )
    t0 = time.time()
    touched = ivf_apply_changes(changes, inc)
    apply_s = time.time() - t0
    after = _cell_files(inc)
    untouched = [
        d
        for d in before
        if d.split("=")[1] not in touched and after.get(d) == before[d]
    ]

    # the rebuild alternative on the post-change corpus
    corpus = (
        base.filter(~F.col("vec_id").isin(del_ids + upd_ids))
        .unionByName(upd_new)
        .unionByName(ins)
    )
    full = os.path.join(root, "full")
    cents = [
        [float(x) for x in r["cvec_d"]]
        for r in spark.read.parquet(inc + "_centroids").orderBy("cid").collect()
    ]
    t0 = time.time()
    ivf_build_index(
        corpus, full, n_centroids=args.cells, centroids=cents,
        membership_nprobe=1,
    )
    rebuild_s = time.time() - t0

    n_inc = spark.read.parquet(inc).count()
    n_full = spark.read.parquet(full).count()
    print(
        f"build {build_s:.1f}s | apply_changes {apply_s:.1f}s touched "
        f"{len(touched)}/{args.cells} cells (untouched files stable: "
        f"{len(untouched)}/{len(before) - len(touched)}) | rebuild "
        f"{rebuild_s:.1f}s | rows inc={n_inc} full={n_full} "
        f"equal={n_inc == n_full}"
    )
    print(
        json.dumps(
            {
                "metric": "ivf_maintenance",
                "vectors": args.vectors,
                "cells": args.cells,
                "changes": args.changes,
                "build_s": round(build_s, 2),
                "apply_s": round(apply_s, 2),
                "rebuild_s": round(rebuild_s, 2),
                "speedup": round(rebuild_s / max(apply_s, 1e-9), 2),
                "touched_cells": len(touched),
                "rows_equal": n_inc == n_full,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
