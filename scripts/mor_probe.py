"""Copy-on-write vs merge-on-read CDC write-amplification probe
(round 10).

The COW committer rewrites every touched bucket per batch — a 1-row
update against a B-bucket table of N rows writes ~N/B rows of parquet
every 5 s trigger. The MOR committer writes only the batch's rows as a
per-bucket delta file and defers the fold. This probe pins both sides
of the trade on the same table and batch sequence:

- per-batch WRITE bytes (sum of the version's new data files, read off
  the manifest delta) and wall time, COW vs MOR;
- read-side cost: full-snapshot read wall with live stacks vs after
  compact_buckets folds them vs the COW table (the MOR read premium
  and what compaction buys back);
- the inline-fold event: hammering one key past MOR_MAX_STACK_DEPTH
  shows the overflow batch paying one bucket rewrite while every other
  batch stayed O(batch).

Usage: python scripts/mor_probe.py [--rows 400000 --batches 12 --buckets 32]
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


def _new_version_bytes(table, v: int) -> int:
    """Bytes of data files INTRODUCED by version v (manifest-derived)."""
    m = table._manifest(v)
    rels: list[str] = []
    if "delta" in m:
        d = m["delta"]
        for fs in d.get("bucket_files_new", {}).values():
            rels.extend(fs)
        for fs in d.get("bucket_delta_files_new", {}).values():
            rels.extend(fs)
    elif "delta_append" in m:
        rels.extend(m["delta_append"]["files_new"])
    else:
        # full manifest: count files not present in the base resolve
        base = m.get("base")
        prev = set(
            table._resolved(base)["files"] if base is not None else []
        )
        for st in (
            table._resolved(base)["bucket_deltas"].values()
            if base is not None
            else []
        ):
            for _v, fs in st:
                prev |= set(fs)
        rels = [f for f in table._resolved(v)["files"] if f not in prev]
    return sum(
        os.path.getsize(os.path.join(table.root, r))
        for r in rels
        if os.path.exists(os.path.join(table.root, r))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from anti_ddos_spark.session import get_spark
    from anti_ddos_spark.sources.versioned import (
        VersionedTable,
        compact_buckets,
        streaming_cdc_committer,
    )

    spark = get_spark(app_name="mor_probe")
    spark.sparkContext.setLogLevel("ERROR")

    seed = (
        spark.range(args.rows)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-"), F.col("id"), F.lit("-" * 64)).alias(
                "v"
            ),
            F.lit("I").alias("op"),
            F.col("id").alias("seq"),
        )
    )

    def run(mode: str):
        root = tempfile.mkdtemp(prefix=f"mor_probe_{mode}_")
        t = VersionedTable(os.path.join(root, "tbl"))
        sink = streaming_cdc_committer(
            t,
            "k",
            seq_col="seq",
            n_buckets=args.buckets,
            merge_on_read=(mode == "mor"),
        )
        sink(seed, 0)
        per_batch = []
        for bid in range(1, args.batches + 1):
            b = spark.createDataFrame(
                [(3, f"u{bid}" + "-" * 64, "U", 10_000_000 + bid)],
                "k long, v string, op string, seq long",
            )
            t0 = time.time()
            sink(b, bid)
            wall = time.time() - t0
            per_batch.append(
                (wall, _new_version_bytes(t, t.current_version()))
            )
        t0 = time.time()
        n = t.read(spark).count()
        read_stacked = time.time() - t0
        read_folded = None
        if mode == "mor":
            compact_buckets(t, spark)
            t0 = time.time()
            assert t.read(spark).count() == n
            read_folded = time.time() - t0
        return root, per_batch, read_stacked, read_folded, n

    results = {}
    roots = []
    for mode in ("cow", "mor"):
        root, per_batch, rs, rf, n = run(mode)
        roots.append(root)
        walls = [w for w, _ in per_batch]
        bytes_ = [b for _, b in per_batch]
        results[mode] = {
            "batch_wall_s": [round(w, 3) for w in walls],
            "batch_bytes": bytes_,
            "total_update_bytes": sum(bytes_),
            "read_stacked_s": round(rs, 3),
            "read_folded_s": round(rf, 3) if rf is not None else None,
            "rows": n,
        }
        print(
            f"{mode}: per-batch bytes {bytes_}\n"
            f"{mode}: per-batch wall {[round(w, 2) for w in walls]}\n"
            f"{mode}: read {rs:.2f}s"
            + (f" (folded {rf:.2f}s)" if rf is not None else "")
        )
    amp = (
        results["cow"]["total_update_bytes"]
        / max(1, results["mor"]["total_update_bytes"])
    )
    print(
        f"\nwrite amplification (COW/MOR total update bytes): {amp:.1f}x"
    )
    print(
        json.dumps(
            {
                "metric": "mor_write_amplification",
                "rows": args.rows,
                "buckets": args.buckets,
                "batches": args.batches,
                "amplification": round(amp, 1),
                **{f"{m}_{k}": v for m, r in results.items() for k, v in r.items()},
            }
        )
    )
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    main()
