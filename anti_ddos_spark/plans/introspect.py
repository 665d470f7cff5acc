"""Physical-plan introspection.

PERF.md's table of plan properties (shuffle counts, pushdown, broadcast
strategy) is enforced as tests via this module: if a refactor silently
adds an Exchange to the flow-feature plan or drops a PushedFilter, the
suite fails — plan shape is part of the engine's contract, not an
accident of the optimizer version.

Counting happens on the pre-execution physical plan (AQE's initial
layout): runtime re-optimization may merge/further-coalesce pieces, but
the static plan is the upper bound we assert against and is stable
across runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame, execute: bool = False) -> dict:
    """execute=True runs the query first so AQE's FINAL plan (with
    WholeStageCodegen spans and runtime join rewrites) is summarized;
    default summarizes the static initial layout."""
    if execute:
        # collect() executes THIS DataFrame's QueryExecution (count()
        # would build a new one, leaving this plan un-finalized)
        df.collect()
    # formatted mode: full (untruncated) scan details incl. PushedFilters
    # and ReadSchema, and explicit "[codegen id : N]" markers
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    plan = jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)

    def nodes(name: str) -> int:
        # formatted explain lists each physical node once as "(N) Name"
        return len(re.findall(rf"^\(\d+\) {name}(?:\s|$)", plan, re.M))

    return {
        "n_shuffle_exchanges": nodes("Exchange"),
        "n_broadcast_exchanges": nodes("BroadcastExchange"),
        "n_broadcast_joins": nodes("BroadcastHashJoin"),
        "n_sortmerge_joins": nodes("SortMergeJoin"),
        "n_sorts": nodes("Sort"),
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        "has_wscg": "codegen id" in plan or "WholeStageCodegen" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": read_schemas,
        "text": plan,
    }
