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

Usage: python scripts/cdc_probe.py [--rows 200000 --batches 5]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*", default=[50_000, 200_000, 800_000])
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args()

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
                prev = set(
                    tbl._manifest(base)["files"]
                ) if base is not None else set()
                new = [f for f in m["files"] if f not in prev]
                return {
                    "files": len(new),
                    "bytes": sum(
                        os.path.getsize(os.path.join(root, f)) for f in new
                    ),
                    "carried": len(prev & set(m["files"])),
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
