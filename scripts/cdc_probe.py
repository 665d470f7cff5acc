"""Bucketed streaming-CDC rewrite cost probe (round 8, VERDICT r7 #1).

Measures what the bounded rewrite buys: per-micro-batch commit latency
for single-key CDC batches against a versioned table of N rows, with
the bucket count as the lever. n_buckets=1 IS the old full-rewrite
behavior (one bucket → every batch touches it → the whole snapshot is
read, merged and rewritten every time); n_buckets=64 is the bounded
path (a single-key batch reads and rewrites ~1/64 of the table, every
other bucket's files carried forward by manifest reference).

The expectation this probe pins: full-rewrite latency grows linearly
with table size while bounded latency stays ~flat (it scales with
bucket size = N/buckets), so the ratio widens with N — at 100 TB with
1024 buckets the same arithmetic is a ~0.1 % rewrite per batch instead
of 100 %.

Round 9 adds the MANIFEST-layer ladder (--versions N): the r8 design
rewrote the full file list into every manifest and listdir'd all
manifests inside the publish lock, so commit cost grew with table file
count AND version count. The ladder drives N delta publishes straight
through _publish (no Spark — this isolates exactly the metadata cost)
against a table of --files synthetic files and reports publish latency
+ manifest bytes at the start vs the end of the chain (flat = fixed),
what the old full-list design would have written per commit, and the
snapshot resolve time at the chain head (bounded by the delta depth
cap, not the version count).

Usage: python scripts/cdc_probe.py [--rows 200000 --batches 5]
       python scripts/cdc_probe.py --versions 10000 --files 20000
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


def versions_ladder(n_versions: int, n_files: int) -> None:
    """Manifest-layer ladder: no Spark, no data — just the publish
    protocol, which is exactly what task r8#2 bounded."""
    from anti_ddos_spark.sources.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="cdc_vladder_")
    tbl = VersionedTable(root)
    n_buckets = 256
    bucket_files = {
        str(b): [
            f"data/d-seed/part-{b:04d}-{i}.parquet"
            for i in range(n_files // n_buckets)
        ]
        for b in range(n_buckets)
    }
    files = [f for b in sorted(bucket_files) for f in bucket_files[b]]
    # round 10: every file carries a disjoint key range so the ladder
    # also measures MANIFEST-stats file skipping at version/file scale
    file_stats = {
        f: {"k": [n * 1000, n * 1000 + 999]} for n, f in enumerate(files)
    }
    tbl._publish(
        files, "overwrite", None,
        extra={"bucket_files": bucket_files, "n_buckets": n_buckets,
               "file_stats": file_stats},
    )
    full_manifest_bytes = os.path.getsize(
        os.path.join(root, "manifests", "v0.json")
    )

    from anti_ddos_spark.sources.versioned import MANIFEST_DELTA_DEPTH_MAX

    def delta_publish(i: int) -> float:
        """One committer-shaped publish: delta below the depth cap, a
        full materialization at it (the amortized checkpoint — its cost
        is part of the honest ladder)."""
        base = tbl.current_version()
        depth = tbl._manifest(base).get("delta_depth", 0)
        b = str(i % n_buckets)
        new_entry = {b: [f"data/d-{i}/part-0.parquet"]}
        new_stats = {
            new_entry[b][0]: {"k": [(n_files + i) * 1000,
                                    (n_files + i) * 1000 + 999]}
        }
        t0 = time.perf_counter()
        if depth < MANIFEST_DELTA_DEPTH_MAX:
            tbl._publish(
                None, "overwrite", base,
                extra={
                    "delta": {
                        "touched": [b],
                        "bucket_files_new": new_entry,
                        "bucket_rows_new": {b: 1},
                        "file_stats_new": new_stats,
                    },
                    "delta_depth": depth + 1,
                    "n_buckets": n_buckets,
                },
            )
        else:
            res = tbl._resolved(base)
            bf = {**res["bucket_files"], **new_entry}
            tbl._publish(
                [f for k in sorted(bf) for f in bf[k]], "overwrite", base,
                extra={"bucket_files": bf, "n_buckets": n_buckets,
                       "file_stats": {**res["file_stats"], **new_stats}},
            )
        return time.perf_counter() - t0

    head, tail_ = [], []
    for i in range(n_versions):
        dt = delta_publish(i)
        if i < 100:
            head.append(dt)
        if i >= max(n_versions - 100, 0):
            tail_.append(dt)  # overlaps head for short ladders (<200)
    v = tbl.current_version()
    mbytes = os.path.getsize(os.path.join(root, "manifests", f"v{v}.json"))
    t0 = time.perf_counter()
    res = tbl._resolved(v)
    resolve_s = time.perf_counter() - t0
    # round 10: manifest-stats file skipping at this version/file scale
    # — a point lookup must keep O(1) files, computed without opening
    # ANY file (there are none; the ladder is metadata-only, which is
    # exactly the proof that pruning never touches data)
    probe_key = (n_files + n_versions - 1) * 1000 + 5  # newest file's range
    t0 = time.perf_counter()
    kept, skipped = tbl.pruned_files(v, [("k", "==", probe_key)])
    prune_s = time.perf_counter() - t0
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "versions": n_versions,
                "publish_ms_first100_med": round(med(head) * 1e3, 3),
                "publish_ms_last100_med": round(med(tail_) * 1e3, 3),
                "delta_manifest_bytes": mbytes,
                "full_manifest_bytes_old_design": full_manifest_bytes,
                "manifest_bytes_ratio": round(full_manifest_bytes / mbytes, 1),
                "resolve_head_s": round(resolve_s, 4),
                "resolved_files": len(res["files"]),
                "skip_kept_files": len(kept),
                "skip_skipped_files": skipped,
                "skip_prune_s": round(prune_s, 4),
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*", default=[50_000, 200_000, 800_000])
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--versions", type=int, default=0)
    ap.add_argument("--files", type=int, default=20_000)
    args = ap.parse_args()
    if args.versions:
        versions_ladder(args.versions, args.files)
        return

    from pyspark.sql import functions as F

    from anti_ddos_spark.session import get_spark
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        streaming_cdc_committer,
    )

    spark = get_spark(app_name="cdc_probe")
    spark.sparkContext.setLogLevel("ERROR")
    schema = "k long, v string, op string, seq long"

    for n_rows in args.rows:
        seed = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
                F.lit("I").alias("op"),
                F.col("id").alias("seq"),
            )
        )
        for n_buckets in (1, 64):
            root = tempfile.mkdtemp(prefix=f"cdc_probe_{n_buckets}_")
            tbl = VersionedTable(root)
            sink = streaming_cdc_committer(
                tbl, "k", seq_col="seq", n_buckets=n_buckets
            )
            sink(seed, 0)  # bootstrap (full merge in both modes)

            def version_bytes() -> dict:
                """bytes/files NEWLY WRITTEN by the live version (its
                files minus the base version's) — the rewrite cost the
                bucket pruning exists to bound."""
                m = tbl._manifest(tbl.current_version())
                base = m["base"]
                cur_files = tbl._resolved(m["version"])["files"]
                prev = set(
                    tbl._resolved(base)["files"]
                ) if base is not None else set()
                new = [f for f in cur_files if f not in prev]
                return {
                    "files": len(new),
                    "bytes": sum(
                        os.path.getsize(os.path.join(root, f)) for f in new
                    ),
                    "carried": len(prev & set(cur_files)),
                }

            # steady state: K single-key update batches
            times, rewrites = [], []
            for i in range(args.batches):
                b = spark.createDataFrame(
                    [(7 + i, f"upd{i}", "U", 10_000_000 + i)], schema
                )
                t0 = time.perf_counter()
                sink(b, i + 1)
                times.append(time.perf_counter() - t0)
                rewrites.append(version_bytes())
            per = sorted(times)
            med = rewrites[len(rewrites) // 2]
            print(
                json.dumps(
                    {
                        "rows": n_rows,
                        "n_buckets": n_buckets,
                        "batch_commit_s_min": round(per[0], 3),
                        "batch_commit_s_med": round(per[len(per) // 2], 3),
                        "rewritten_bytes_per_batch": med["bytes"],
                        "rewritten_files_per_batch": med["files"],
                        "carried_files": med["carried"],
                        "live_rows": tbl.read(spark).count(),
                    }
                ),
                flush=True,
            )
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
