"""Skew-mitigation operators (SURVEY §2.5 scale extensions).

DDoS traffic is the canonical skewed workload: one attacked 5-tuple can
carry orders of magnitude more packets than the median flow, so a plain
``groupBy(flow_key)`` sends the hot key to a single reducer. Two
mitigations ship here:

- **AQE skew-join splitting** is enabled globally in the session factory
  (spark.sql.adaptive.skewJoin) and needs no code.
- **Salted two-stage aggregation** below handles skewed *aggregations*
  (AQE does not split those): stage 1 aggregates on (key, salt) spreading
  the hot key over N reducers, stage 2 merges the N partials per key.
  Works for any algebraic aggregate (sum/count/min/max and combinations
  like mean = sum/count merged at stage 2).

The result is EXACTLY equal to the unsalted aggregate (oracle-checked by
q28), costing one extra (tiny) shuffle of pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs maps output column name → (merge_fn_name, stage1 Column), where
    merge_fn_name ∈ {"sum", "min", "max"} is how stage-2 combines the
    per-salt partials. Example::

        salted_agg(df, ["k"], {
            "n":     ("sum", F.count("*")),
            "total": ("sum", F.sum("v")),
            "lo":    ("min", F.min("v")),
        })

    The salt is a uniform hash of the full row spread over n_salts; it
    is deterministic (pmod of xxhash64 over all columns) so retries and
    oracle comparisons are stable.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, (_, c) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    stage2 = stage1.groupBy(*keys).agg(
        *[
            merge[how](f"__p_{name}").alias(name)
            for name, (how, _) in aggs.items()
        ]
    )
    return stage2
