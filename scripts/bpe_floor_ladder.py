"""Bounded-histogram BPE trainer ladder (round 10, r9 verdict task #2).

The exact trainer collects the FULL (word, cnt) histogram; on a web
corpus the pretoken long tail (URLs, numbers, typos) is 10⁸+ singletons
— tens of driver GBs before training starts. ``bpe_learn_capped``
filters ``cnt >= hist_floor`` BEFORE the collect and certifies
merge-list identity via the dropped-tail adjacency-mass margin bound
(see operators/bpe.py). This ladder measures, on the Zipf decade
corpora (the same fixture the MinHash/ANN s-curves scale on):

  per (corpus, floor): rows/bytes collected vs dropped, dropped
  adjacency mass M, the certified-identical PREFIX length, and
  GROUND-TRUTH merge-list parity vs the exact (floor=1) trainer at the
  same merge count — so the certificate's "proven prefix ⟹ identical
  prefix" is checked against reality, and the uncertified region's
  actual fidelity is measured instead of guessed.

``--junk-tail N`` unions N unique singleton hash-like pretokens (md5
hex of the index) into the histogram — the web-corpus long tail the r9
verdict names (URLs/hashes/typos), which the pure-Zipf fixture lacks
(its vocabulary is closed, so nothing drops below floor 4). Hex junk
is ADVERSARIAL in a realistic way: the junk words share hex-digram
pairs, so the tail's mass concentrates instead of scattering — exactly
the case where a floor can genuinely change what BPE learns.

The corpus-sized histogram aggregate runs ONCE per corpus
(localCheckpoint — it is V-bounded); per-floor work is a V-bounded
filter + collect, which is exactly the axis under measurement.

Numbers recorded in PERF.md "Round 10: bounded histogram collect".

Usage: python scripts/bpe_floor_ladder.py [--n-docs 500000 [--n-docs ...]]
           [--dir-base /tmp/zipf_floor] [--merges 2000]
           [--floors 1,2,4,8,16] [--junk-tail 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, action="append", default=None)
    ap.add_argument("--dir-base", default="/tmp/zipf_floor")
    ap.add_argument("--merges", type=int, default=2000)
    ap.add_argument("--floors", default="1,2,4,8,16")
    ap.add_argument("--junk-tail", type=int, default=0)
    args = ap.parse_args()
    n_docs_list = args.n_docs or [50_000, 500_000]
    floors = [int(x) for x in args.floors.split(",")]

    import scale_probe
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.bpe import bpe_learn_capped, word_histogram
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="bpe_floor_ladder")
    spark.sparkContext.setLogLevel("ERROR")

    for n_docs in n_docs_list:
        d = f"{args.dir_base}_{n_docs}"
        doc_path = os.path.join(d, "documents.parquet")
        if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
            t0 = time.perf_counter()
            scale_probe.build_zipf_documents(spark, d, n_docs=n_docs)
            emit(stage="build_corpus", n_docs=n_docs,
                 sec=round(time.perf_counter() - t0, 1))
        docs = spark.read.parquet(doc_path)

        t0 = time.perf_counter()
        hist = word_histogram(docs)
        if args.junk_tail:
            junk = spark.range(args.junk_tail).select(
                F.md5(F.col("id").cast("string")).alias("word"),
                F.lit(1).cast("long").alias("cnt"),
            )
            hist = hist.unionByName(junk)
        hist = hist.localCheckpoint()
        v = hist.count()
        emit(stage="histogram", n_docs=n_docs, vocab=v,
             junk_tail=args.junk_tail,
             sec=round(time.perf_counter() - t0, 1))

        exact_merges = None
        for floor in floors:
            t0 = time.perf_counter()
            merges, stats = bpe_learn_capped(
                hist, num_merges=args.merges, hist_floor=floor
            )
            sec = time.perf_counter() - t0
            if floor <= 1:
                exact_merges = merges
                parity, first_div = True, None
            else:
                assert exact_merges is not None, "run floor=1 first"
                parity = merges == exact_merges
                first_div = next(
                    (i for i, (a, b) in enumerate(
                        zip(merges, exact_merges)) if a != b),
                    None if parity else min(len(merges), len(exact_merges)),
                )
            cp = stats["certified_prefix"]
            if exact_merges is not None and merges[:cp] != exact_merges[:cp]:
                raise AssertionError(
                    f"certificate violated at floor={floor}: prefix {cp} "
                    f"certified but diverges at {first_div}"
                )
            emit(stage="floor", n_docs=n_docs, floor=floor,
                 learned=len(merges), sec=round(sec, 2),
                 rows_kept=stats["rows_kept"],
                 rows_dropped=stats["rows_dropped"],
                 collected_mb=round(stats["collected_bytes_est"] / 2**20, 3),
                 dropped_adjacency_mass=stats["dropped_adjacency_mass"],
                 certified_prefix=cp,
                 stop_reason=stats["stop_reason"],
                 certified=stats["certified"],
                 parity_vs_exact=parity,
                 first_divergence=first_div)


if __name__ == "__main__":
    main()
