"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is fully executed via a
count-collapsing noop action (write to a no-op sink would hide result
materialization; we use .foreach-free collect of an agg summary to force
every operator while keeping driver transfer negligible).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_join_revenue",
    "q05_semi_join",
    "q08_window_rank",
    "q09_running_sum",
    "q12_distinct_counts",
    "q16_json_extract",
    "q20_event_sessions",
    "q21_event_iat_stats",  # demoted to EXTRA_QUERIES; resolved via full_registry
    "q24_flow_features_full",
    # round 2: track the LLM-pipeline plans too — banded MinHash dedup
    # at the production s-curve (the demo-parameter q32 is intentionally
    # permissive banding and goes near-quadratic at sf0.1), LSH near-dup
    # (replaced r1's label-bucketed all-pairs), and the curation funnel
    "q35_minhash_prod",
    "q42_cosine_neardup_pairs",
    "q37_curation_funnel",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from anti_ddos_spark.queries import full_registry
    from anti_ddos_spark.session import get_spark

    spark = get_spark(app_name="anti_ddos_spark_bench")
    reg = full_registry()

    # JVM/codegen warmup on the smallest sf so per-query numbers measure
    # the plan, not first-call compilation.
    # Warm EVERY headline query AT THE MEASURED SF: whole-stage-codegen
    # compilation of the wide feature plans costs seconds on first
    # execution (measured: q24 5.5 s cold vs 1.6 s steady-state), and AQE
    # produces size-dependent physical plans, so warming at a smaller SF
    # leaves the measured-SF code uncompiled. On a long-lived cluster
    # these compile once per executor lifetime; steady-state is the
    # honest number for scale extrapolation.
    from pyspark.sql import functions as F

    for name in HEADLINE:
        wdf = reg[name].fn(spark, sf_dir)
        wdf.agg(F.count(F.lit(1)), F.max(F.xxhash64(*wdf.columns))).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = reg[name]
        t0 = time.perf_counter()
        # Force full execution: count() alone would let Catalyst prune
        # computed columns, so reduce a hash over every output column.
        from pyspark.sql import functions as F

        df = q.fn(spark, sf_dir)
        df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*df.columns))).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
