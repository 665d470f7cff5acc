"""Planted-pair RECALL of the scalable near-dup postures on the
Zipf/Heaps corpus (the second half of round-6 verdict task #4).

`scale_probe.build_zipf_documents` plants ~5% near-duplicates with
KNOWN ids: every doc with doc_id % 20 == 19 reuses doc_id-1's content
seed with only its last 3 token slots re-drawn (same length, same
source bucket, same n_chars band — the pair is never split by the
blocking keys). That gives this corpus something the ~30-word demo
fixture never had: ground truth, so the recall half of the df-cap
trade can be MEASURED instead of argued.

The claims under test (PERF.md "token-space saturation"):
- the df-capped prefix join (``max_prefix_df``) bounds candidates at
  the cost of recall, and on Zipfian text recall stays HIGH because
  true near-dup pairs share RARE grams which survive any sane cap;
- MinHash banding (q35, production s-curve) keeps ~full recall at
  high similarity with no df-dependence at all.

Denominator validation: the exact (cap=None) recall-1 form is run at
the smallest scale — its recall must be 1.000 by construction, pinning
that the planted pairs really do clear the ≥30% trigram-Jaccard bar.

Usage: python scripts/zipf_recall.py --dirs /tmp/zipf_1x,/tmp/zipf_10x
          [--caps 100,200,1000] [--exact-at /tmp/zipf_1x] [--minhash]

Writes one JSON line per (dir, detector) with planted/found/recall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="/tmp/zipf_1x,/tmp/zipf_10x")
    ap.add_argument("--caps", default="100,200,1000")
    ap.add_argument(
        "--w5-caps",
        default="",
        help="df caps for the WIDER-n-gram capped form (w=5). Why it "
        "exists: the char-TRIGRAM space is bounded at |alphabet|^3 "
        "(~19.7k over [a-z ]), so past ~100k docs no trigram is rare and "
        "an absolute df cap destroys recall (measured: cap100 recall 0.0 "
        "at 500k Zipf docs). 5-grams multiply the attainable space to "
        "~27^5, restoring rare grams for the prefix to keep.",
    )
    ap.add_argument(
        "--exact-at",
        default="/tmp/zipf_1x",
        help="dirs (comma list) where the recall-1 exact form is affordable",
    )
    ap.add_argument("--no-minhash", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.dedup import minhash_candidates
    from anti_ddos_spark.queries.textops import ngram_jaccard_pairs
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="zipf_recall")
    spark.sparkContext.setLogLevel("ERROR")
    exact_dirs = set(args.exact_at.split(",")) if args.exact_at else set()

    for d in args.dirs.split(","):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        planted = docs.filter(
            (F.pmod(F.col("doc_id"), F.lit(20)) == 19) & (F.col("doc_id") > 0)
        ).select(
            (F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b")
        )
        n_planted = planted.count()

        detectors = []
        if d in exact_dirs:
            detectors.append(("jaccard_exact", lambda: ngram_jaccard_pairs(docs)))
        for cap in (int(c) for c in args.caps.split(",") if c):
            detectors.append(
                (
                    f"jaccard_cap{cap}",
                    lambda cap=cap: ngram_jaccard_pairs(docs, max_prefix_df=cap),
                )
            )
        for cap in (int(c) for c in args.w5_caps.split(",") if c):
            detectors.append(
                (
                    f"jaccard_w5_cap{cap}",
                    lambda cap=cap: ngram_jaccard_pairs(
                        docs, max_prefix_df=cap, ngram_w=5
                    ),
                )
            )
        if not args.no_minhash:
            # production s-curve; count a pair found if it surfaced as a
            # banding candidate at all (the verify join then scores it)
            detectors.append(("minhash_prod", lambda: minhash_candidates(docs)))

        for name, build in detectors:
            pairs = build().select("id_a", "id_b")
            found = planted.join(pairs, ["id_a", "id_b"], "left_semi").count()
            print(
                json.dumps(
                    {
                        "dir": d,
                        "detector": name,
                        "planted": n_planted,
                        "found": found,
                        "recall": round(found / n_planted, 4) if n_planted else None,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
