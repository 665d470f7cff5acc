"""Production-size BPE vocabulary end-to-end (round 9, r8 verdict task #4).

The round-8 ladder proved the local trainer at 1,000 merges; production
vocabularies are 30k+. This script runs the full production shape once:

1. ONE distributed histogram pass over the 5M-doc Zipf decade corpus
   (the same fixture the MinHash/ANN s-curves scale on) and a V-bounded
   collect (Heaps: V ≈ 138k words at 300M tokens).
2. ``bpe_learn_local`` at 30,000 merges — amortized ms/merge at
   production size is the headline.
3. Freeze the merge list as the v2 committed artifact
   (``anti_ddos_spark/artifacts/bpe_merges_30k.json``; sha256 + corpus
   params recorded so the learn is reproducible offline).
4. APPLY at |V|=30k: ``bpe_tokenize_large_vocab`` (vocabulary segmented
   once by the exact heap segmenter in Arrow batches, positional
   join-back) over the decade corpus — docs/s and tokens/s.
5. The fold form's expression-tree limit: chain ``segment_expr`` at
   doubling merge counts over a tiny frame until Catalyst breaks or the
   per-100-row wall time passes 120 s — the measured boundary that
   makes the UDF-segmented vocabulary path the production apply.

Numbers recorded in PERF.md "Round 9: 30k-merge vocabulary end-to-end".

Usage: python scripts/bpe30k_ladder.py [--n-docs 5000000]
           [--dir /tmp/zipf_30k] [--merges 30000] [--skip-fold-ladder]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

ART = os.path.join(REPO, "anti_ddos_spark", "artifacts")


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=5_000_000)
    ap.add_argument("--dir", default="/tmp/zipf_30k")
    ap.add_argument("--merges", type=int, default=30_000)
    ap.add_argument("--skip-fold-ladder", action="store_true")
    ap.add_argument("--skip-apply", action="store_true")
    args = ap.parse_args()

    import scale_probe
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.bpe import (
        bpe_learn_local,
        bpe_tokenize_large_vocab,
        segment_expr,
        word_histogram,
    )
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="bpe30k_ladder")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(args.dir, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        t0 = time.perf_counter()
        scale_probe.build_zipf_documents(spark, args.dir, n_docs=args.n_docs)
        emit(stage="build_corpus", n_docs=args.n_docs,
             sec=round(time.perf_counter() - t0, 1))
    docs = spark.read.parquet(doc_path)

    # 1. the one corpus-sized pass
    t0 = time.perf_counter()
    rows = [(r[0], r[1]) for r in word_histogram(docs).collect()]
    t1 = time.perf_counter()
    n_tokens = sum(c for _, c in rows)
    emit(stage="histogram", vocab=len(rows), tokens=n_tokens,
         sec=round(t1 - t0, 1))

    # 2. the production-size learn
    t2 = time.perf_counter()
    merges = bpe_learn_local(list(rows), args.merges)
    t3 = time.perf_counter()
    emit(stage="learn_local", requested=args.merges, learned=len(merges),
         sec=round(t3 - t2, 2),
         ms_per_merge=round((t3 - t2) / max(len(merges), 1) * 1000, 4))

    # 3. freeze the v2 artifact
    canon = "\n".join(f"{a} {b}" for a, b in merges)
    meta = {
        "merges": [list(m) for m in merges],
        "num_merges_requested": args.merges,
        "learned": len(merges),
        "train_fixture": f"zipf n_docs={args.n_docs} (scripts/scale_probe."
                         f"build_zipf_documents, deterministic)",
        "merges_sha256": hashlib.sha256(canon.encode()).hexdigest(),
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "bpe_merges_30k.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    emit(stage="freeze", path="anti_ddos_spark/artifacts/bpe_merges_30k.json",
         learned=len(merges), sha256=meta["merges_sha256"])

    # 4. apply at |V|=30k over the decade corpus
    if not args.skip_apply:
        for label, frame in (("decade_5m", docs),):
            t4 = time.perf_counter()
            out = bpe_tokenize_large_vocab(
                frame.select("doc_id", "text"), merges, key_cols=["doc_id"]
            )
            got = out.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum(F.size("bpe_tokens")).alias("tokens"),
            ).collect()[0]
            t5 = time.perf_counter()
            emit(stage="apply_large_vocab", corpus=label,
                 docs=got["docs"], tokens=int(got["tokens"]),
                 sec=round(t5 - t4, 1),
                 docs_per_sec=int(got["docs"] / (t5 - t4)),
                 tokens_per_sec=int(got["tokens"] / (t5 - t4)))

    # 5. fold-form expression-tree limit (100-row frame: the cost under
    # measurement is plan analysis + codegen, not data)
    if not args.skip_fold_ladder:
        tiny = spark.createDataFrame(
            [(i, " ".join(w for w, _ in rows[i * 3:i * 3 + 12]))
             for i in range(100)],
            "doc_id long, text string",
        ).localCheckpoint()
        k = 32
        while k <= min(len(merges), 8192):
            sub = merges[:k]
            t6 = time.perf_counter()
            try:
                tiny.select(
                    F.flatten(
                        F.transform(
                            F.split("text", " "),
                            lambda w: segment_expr(w, sub),
                        )
                    ).alias("toks")
                ).agg(F.sum(F.size("toks"))).collect()
                sec = round(time.perf_counter() - t6, 1)
                emit(stage="fold_ladder", merges=k, sec=sec, ok=True)
                if sec > 120:
                    emit(stage="fold_ladder_stop", merges=k,
                         reason="per-100-row wall time exceeded 120 s")
                    break
            except Exception as ex:  # noqa: BLE001 — the breakpoint IS the result
                emit(stage="fold_ladder", merges=k, ok=False,
                     sec=round(time.perf_counter() - t6, 1),
                     error=type(ex).__name__,
                     detail=str(ex).split("\n")[0][:200])
                break
            k *= 2


if __name__ == "__main__":
    main()
