"""Composed storage-decade probe (round 13, VERDICT r12 task #7).

Every storage feature has per-feature scale evidence (the 10k-version
manifest ladder, the MOR read probe, skipping at 10^6 files); this
probe composes them on ONE growing table: a merge-on-read CDC table is
seeded at N rows per decade (N = 30k, 300k, 3M by default), then on the
SAME table we measure, per decade,

  commit   — wall + rewritten-file count for one small (100-key) CDC
             batch (policy-sized buckets hold rows/bucket ~constant, so
             the touched-bucket rewrite should NOT scale with N)
  mor_read — wall + Catalyst scan count for the stack-overlaid snapshot
             after 3 delta batches (scans bounded by stack depth, bytes
             linear in N)
  manifest — bytes of the DELTA manifest a small commit publishes
             (bounded by touched buckets, NOT by table file count)
  point    — wall + files-touched for a single-key point lookup (the
             hash layout's skipping mechanism: key_buckets prunes to
             ONE bucket's files regardless of N; min/max STAT skipping
             is structurally inert on a hash layout — every bucket
             spans the full key range — and is evidenced on compacted/
             Z-ordered layouts by q142's 10^6-file ladder instead)
  cdf_tail — the last commit's change feed, both ways: the REAL
             streaming CDF source (availableNow tail from the previous
             version — per-batch partitions are bucket-bounded, wall
             is startup-floor dominated and should stay ~flat) and the
             version_changes relational twin (full-snapshot diff —
             alpha ~1 by design, the NAMED cause: it is the audit twin,
             not the production tail)

For each axis the probe prints the decade ladder and alpha =
log10(v_next / v_prev) per decade step — alpha ~0 claims flat, ~1
linear. Wall-clock axes are noisy on a shared box; the STRUCTURAL
columns (files rewritten, scans, manifest bytes, files pruned, rows
emitted) are the contract, seconds are corroboration (memory:
measurement-discipline).

Usage: python scripts/storage_probe.py [--sizes 30000,300000,3000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="30000,300000,3000000")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from anti_ddos_spark.session import get_spark
    from anti_ddos_spark.sources.cdf import version_changes
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        streaming_cdc_committer,
    )

    spark = get_spark(app_name="storage_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def batch(ids, op, seq0):
        # payload varies with seq0 so every batch is a REAL change
        # (identical-payload updates correctly diff to nothing)
        return spark.createDataFrame(
            [(int(k), int(k * 7 % 1000) + seq0, op, seq0 + i)
             for i, k in enumerate(ids)],
            "k long, v long, op string, seq long",
        )

    results: dict[int, dict] = {}
    for n in sizes:
        root = tempfile.mkdtemp(prefix="ad_storage_probe_")
        tbl = VersionedTable(root)
        sink = streaming_cdc_committer(
            tbl, "k", seq_col="seq", merge_on_read=True,
            txn_app_id="probe",
        )
        # seed: N rows, policy-sized buckets (buckets_for(N))
        seed = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                (F.col("id") * 7 % 1000).alias("v"),
                F.lit("I").alias("op"),
                F.col("id").alias("seq"),
            )
        )
        t0 = time.perf_counter()
        sink(seed, 0)
        t_seed = time.perf_counter() - t0

        m = tbl._manifest(tbl.current_version())
        nb = m.get("n_buckets")
        res = tbl._resolved(tbl.current_version())
        total_files = len(res["files"])

        # --- axis: commit (100-key batch against the seeded table) ----
        keys = list(range(0, n, max(1, n // 100)))[:100]
        t0 = time.perf_counter()
        sink(batch(keys, "U", 10_000_000), 1)
        t_commit = time.perf_counter() - t0
        res1 = tbl._resolved(tbl.current_version())
        delta_files = sum(
            len(fs) for st in res1["bucket_deltas"].values()
            for _v, fs in st
        )
        # --- axis: delta manifest bytes --------------------------------
        mpath = os.path.join(
            root, "manifests", f"v{tbl.current_version()}.json"
        )
        manifest_bytes = os.path.getsize(mpath)

        # --- two more delta batches -> stack depth 3 -------------------
        sink(batch(keys, "U", 20_000_000), 2)
        sink(batch(keys, "U", 30_000_000), 3)

        # --- axis: MOR overlay read ------------------------------------
        snap = tbl.read(spark)
        plan = snap._jdf.queryExecution().executedPlan().toString()
        n_scans = plan.count("Scan parquet")
        t0 = time.perf_counter()
        cnt = snap.count()
        t_mor = time.perf_counter() - t0
        assert cnt == n, (cnt, n)

        # --- axis: point lookup (bucket pruning on the key hash) -------
        probe_key = keys[len(keys) // 2]
        resv = tbl._resolved(tbl.current_version())
        kb = tbl.key_buckets(spark, [probe_key])
        assert kb is not None
        owned = list(kb[1])
        point_files = sum(
            len(resv["bucket_files"].get(b, ())) for b in owned
        ) + sum(
            len(fs)
            for b in owned
            for _v, fs in resv["bucket_deltas"].get(b, ())
        )
        t0 = time.perf_counter()
        got = tbl.read_point(spark, [probe_key]).collect()
        t_point = time.perf_counter() - t0
        assert len(got) == 1

        # --- axis: CDF tail (last commit only, both paths) -------------
        v = tbl.current_version()
        base_v = tbl._manifest(v)["base"]
        from anti_ddos_spark.sources.cdf import register_cdf_source

        register_cdf_source(spark)
        qn = f"probe_tail_{n}"
        ckpt = tempfile.mkdtemp(prefix="ad_probe_ckpt_")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("versioned_cdf")
            .option("root", root)
            .option("key", "k")
            .option("start_version", base_v)
            .load()
            .writeStream.format("memory")
            .queryName(qn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        t_tail_stream = time.perf_counter() - t0
        tail_rows = spark.table(qn).count()
        spark.catalog.dropTempView(qn)
        shutil.rmtree(ckpt, ignore_errors=True)
        # version_changes is INCLUSIVE of from_version (the streaming
        # start_version is exclusive) — from=v tails exactly v's batch
        t0 = time.perf_counter()
        tail_rel_rows = version_changes(spark, tbl, "k", v, v).count()
        t_tail_rel = time.perf_counter() - t0

        results[n] = {
            "n_buckets": nb,
            "seed_s": round(t_seed, 2),
            "commit_s": round(t_commit, 2),
            "commit_delta_files": delta_files,
            "manifest_bytes": manifest_bytes,
            "mor_read_s": round(t_mor, 2),
            "mor_scans": n_scans,
            "mor_rows": cnt,
            "total_files": total_files,
            "point_files_touched": point_files,
            "point_s": round(t_point, 2),
            "cdf_tail_stream_s": round(t_tail_stream, 2),
            "cdf_tail_rows": tail_rows,
            "cdf_tail_rel_s": round(t_tail_rel, 2),
            "cdf_tail_rel_rows": tail_rel_rows,
        }
        print(n, json.dumps(results[n]))
        shutil.rmtree(root, ignore_errors=True)

    # alpha per decade step per axis
    axes = [
        "commit_s", "commit_delta_files", "manifest_bytes",
        "mor_read_s", "mor_scans", "point_files_touched",
        "point_s", "cdf_tail_stream_s", "cdf_tail_rel_s",
        "cdf_tail_rows",
    ]
    print("\nalpha per decade step (log10 ratio / log10 size ratio):")
    ordered = sorted(results)
    for ax in axes:
        alphas = []
        for a, b in zip(ordered, ordered[1:]):
            va, vb = results[a][ax], results[b][ax]
            if va and vb:
                alphas.append(
                    round(
                        math.log10(vb / va) / math.log10(b / a), 2
                    )
                )
            else:
                alphas.append(None)
        print(f"  {ax:22s} {alphas}")
    out = {"sizes": ordered, "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
