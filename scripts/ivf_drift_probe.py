"""IVF centroid-drift probe (r11 verdict task #7's PERF row).

Plants a drifting corpus and walks the monitor→retrain policy:
build an index on 4 clusters, append 4 UNSEEN clusters (postings
maintenance keeps the lists fresh; the centroids go stale), and
print the drift report plus nprobe=2 search recall vs brute force
before and after ivf_retrain.

Usage: python scripts/ivf_drift_probe.py [n_per_cluster] [dim]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.similarity import (
        brute_force_topk,
        ivf_append_index,
        ivf_build_index,
        ivf_drift_report,
        ivf_retrain,
        ivf_search_index,
    )
    from anti_ddos_spark.session import get_spark

    per = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    spark = get_spark(app_name="ivf_drift_probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)

    def make(centers, id0):
        rows = []
        for c, ctr in enumerate(centers):
            for m in range(per):
                v = ctr + 0.06 * rng.normal(size=dim)
                v /= np.linalg.norm(v)
                rows.append((id0 + c * per + m, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>"
        )

    def centers(k):
        c = rng.normal(size=(k, dim))
        return c / np.linalg.norm(c, axis=1, keepdims=True)

    base = make(centers(4), 0)
    path = os.path.join(tempfile.mkdtemp(prefix="ivf_drift_"), "idx")
    t0 = time.time()
    ivf_build_index(base, path, n_centroids=4, centroids="learned",
                    membership_nprobe=1)
    t_build = time.time() - t0

    drifted = make(centers(4), 10_000_000)
    ivf_append_index(drifted, path)
    full = base.unionByName(drifted).localCheckpoint()

    def recall(qids):
        hits = total = 0
        for qid in qids:
            qvec = [
                float(x)
                for x in full.filter(F.col("vec_id") == qid).first()[
                    "embedding"
                ]
            ]
            want = {
                r["vec_id"]
                for r in brute_force_topk(full, qid, k=10).collect()
            }
            got = {
                r["vec_id"]
                for r in ivf_search_index(
                    spark, path, qvec, k=11, nprobe=2
                ).collect()
                if r["vec_id"] != qid
            }
            hits += len(want & got)
            total += len(want)
        return hits / total

    qids = [0, per + 3, 10_000_000, 10_000_000 + per + 3,
            10_000_000 + 3 * per + 7]
    t0 = time.time()
    report = ivf_drift_report(spark, path)
    t_report = time.time() - t0
    rec_before = recall(qids)
    t0 = time.time()
    ivf_retrain(spark, path)
    t_retrain = time.time() - t0
    report_after = ivf_drift_report(spark, path)
    rec_after = recall(qids)
    print(json.dumps({
        "n_vectors": int(2 * 4 * per), "dim": dim,
        "build_sec": round(t_build, 2),
        "drift_report": report,
        "monitor_sec": round(t_report, 2),
        "recall_nprobe2_before_retrain": round(rec_before, 3),
        "retrain_sec": round(t_retrain, 2),
        "report_after": report_after,
        "recall_nprobe2_after_retrain": round(rec_after, 3),
    }))


if __name__ == "__main__":
    main()
