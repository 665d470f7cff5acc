"""BPE merge-count ladder (round 8, r7 verdict task #5).

Measures, on the Zipf/Heaps fixture (realistic vocabulary growth):

- the one corpus-sized pass (word histogram build + collect);
- ``bpe_learn_local`` (exact queue-based trainer) at 12 / 100 / 1000
  merges — amortized per-merge cost is the ladder's headline;
- the distributed ``bpe_learn`` loop at 12 / 50 merges, post
  localCheckpoint fix (linear ~0.35 s/merge round-trip floor), with an
  exactness check against the local trainer at each point.

Numbers recorded in PERF.md "Round 8: BPE merge-count ladder".

Usage: python scripts/bpe_ladder.py [--n-docs 50000] [--dir /tmp/zipf_ladder]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--dir", default="/tmp/zipf_ladder")
    args = ap.parse_args()

    import scale_probe
    from anti_ddos_spark.operators.bpe import (
        bpe_learn,
        bpe_learn_local,
        word_histogram,
    )
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="bpe_ladder")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(args.dir, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        scale_probe.build_zipf_documents(spark, args.dir, n_docs=args.n_docs)
    docs = spark.read.parquet(doc_path)

    hist = word_histogram(docs)
    t0 = time.perf_counter()
    rows = [(r[0], r[1]) for r in hist.collect()]
    t1 = time.perf_counter()
    print(
        json.dumps(
            {"stage": "histogram", "vocab": len(rows), "sec": round(t1 - t0, 2)}
        ),
        flush=True,
    )

    for n in (12, 100, 1000):
        t2 = time.perf_counter()
        merges = bpe_learn_local(list(rows), n)
        t3 = time.perf_counter()
        print(
            json.dumps(
                {
                    "stage": "local",
                    "merges": n,
                    "learned": len(merges),
                    "sec": round(t3 - t2, 3),
                    "ms_per_merge": round(
                        (t3 - t2) / max(len(merges), 1) * 1000, 3
                    ),
                }
            ),
            flush=True,
        )

    for n in (12, 50):
        t4 = time.perf_counter()
        md = bpe_learn(hist, n)
        t5 = time.perf_counter()
        print(
            json.dumps(
                {
                    "stage": "distributed",
                    "merges": n,
                    "sec": round(t5 - t4, 1),
                    "equal_to_local": md == bpe_learn_local(list(rows), n),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
