"""As-of and interval (range) joins — SURVEY §2.5 extension surface.

The reference has no joins at all (SURVEY §2.5; the only join-like thing
is schema-intersection column selection, spark_app/main.py:1084), but an
enrichment/as-of surface is the natural extension of its flow pipeline
and the driver's correctness sweep exercises it.

Scale design (100 TB):

- **As-of** is NOT implemented as an inequality join (which Spark plans
  as a per-key cross product — O(n·m) per user at scale). Instead we use
  the sort-merge shape: union both sides into one keyed stream, one
  shuffle on the key, then ``last(value, ignorenulls=True)`` over an
  ordered running frame carries the most recent right-side row forward.
  One shuffle, no cross product, whole-stage codegen end to end.
  DuckDB's native ``ASOF JOIN`` is the oracle — a genuinely independent
  algorithm computing the same relation.

- **Interval join** buckets time into fixed windows and equi-joins on
  (key, bucket) with the left side exploded to the two candidate
  buckets, then applies the exact range predicate as a post-filter.
  This turns "ts within [t-5min, t)" from an inequality join into an
  equi-join Spark can hash/sort-merge partition, the standard
  stream-stream interval-join shape (Flink/Spark both plan it this way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from anti_ddos_spark.queries.base import Query, rnd, t

RANGE_S = 300  # interval-join lookback, seconds


# --- q25: as-of join (most recent purchase per click) ---------------------

def q25_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid"), F.col("value").alias("pval")
    )
    left = clicks.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("pid"),
        F.lit(None).cast("double").alias("pval"),
        F.lit(1).alias("tag"),
    )
    right = purchases.select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        "pid",
        "pval",
        F.lit(0).alias("tag"),
    )
    # tag orders purchases before clicks at equal ts → "at or before".
    # Tie-dedupe (one purchase per (user, ts), keep max pid) happens
    # INSIDE the same window pass: same-ts purchases sort adjacently in
    # pid order, so a purchase "counts" only if the next row isn't
    # another purchase at the same ts. Both window functions share one
    # partitioning/ordering → ONE Exchange + ONE Sort total (enforced by
    # tests/test_plans.py::test_q25_asof_single_shuffle).
    u = left.unionByName(right)
    order = W.partitionBy("user_id").orderBy("ts", "tag", "pid")
    nxt_dup = (F.lead("tag").over(order) == 0) & (F.lead("ts").over(order) == F.col("ts"))
    pid_kept = F.when((F.col("tag") == 0) & ~F.coalesce(nxt_dup, F.lit(False)), F.col("pid"))
    pval_kept = F.when((F.col("tag") == 0) & ~F.coalesce(nxt_dup, F.lit(False)), F.col("pval"))
    run = order.rowsBetween(W.unboundedPreceding, 0)
    u = (
        u.withColumn("pid_kept", pid_kept)
        .withColumn("pval_kept", pval_kept)
        .withColumn("last_pid", F.last("pid_kept", ignorenulls=True).over(run))
        .withColumn("last_pval", F.last("pval_kept", ignorenulls=True).over(run))
    )
    return u.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("last_pid").alias("last_purchase_id"),
        rnd(F.col("last_pval"), 4).alias("last_purchase_value"),
    )


Q25_SQL = """
WITH p AS (
  SELECT user_id, ts, max(event_id) AS pid, max_by(value, event_id) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT c.event_id,
       c.user_id,
       epoch_us(c.ts)                      AS ts_us,
       p.pid                               AS last_purchase_id,
       floor(p.pval * 10000 + 0.5) / 10000.0 AS last_purchase_value
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# --- q26: interval join (clicks in the 5 min before each error) -----------

def _range_bucket(ts: F.Column) -> F.Column:
    """Integer-division time bucket, identical expression on both join
    sides — float-division variants can floor() to different buckets at
    the edges and silently drop matches. (m - m % k) is exact long
    arithmetic; the final / is an exact small-integer double."""
    m = F.unix_micros(ts)
    k = F.lit(RANGE_S * 1_000_000)
    return ((m - F.pmod(m, k)) / k).cast("long")


def q26_range_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
        _range_bucket(F.col("ts")).alias("c_bucket"),
    )
    # each error probes its own bucket and the previous one — the only two
    # that can contain a click within the RANGE_S lookback
    b = _range_bucket(F.col("ts"))
    probes = errors.withColumn("c_bucket", F.explode(F.array(b - 1, b)))
    joined = probes.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (probes.c_bucket == clicks.c_bucket)
        & (F.col("cts") >= F.col("ts") - F.expr(f"INTERVAL {RANGE_S} SECONDS"))
        & (F.col("cts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("cts").alias("n_recent_clicks")
    ).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "n_recent_clicks",
    )


Q26_SQL = f"""
SELECT e.event_id,
       e.user_id,
       epoch_us(e.ts) AS ts_us,
       count(c.ts)    AS n_recent_clicks
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL {RANGE_S} SECONDS
 AND c.ts <  e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id, e.ts
"""


QUERIES: dict[str, Query] = {
    "q25_asof_join": Query(
        q25_asof_join,
        Q25_SQL,
        "as-of join via union + running last() (sort-merge shape, one shuffle)",
    ),
    "q26_range_join": Query(
        q26_range_join,
        Q26_SQL,
        "interval join via time-bucket equi-join + exact range post-filter",
    ),
}


# Round-13 rotation (r12 verdict task #1, ninth rotation): q26's
# interval-join machinery is transitively driver-pinned through the
# stream-stream interval joins (q93 inner, q118 left, q129 full outer)
# and q25 keeps the as-of twin driver-visible; its slot funds the
# round-12 storage family promoted in queries/core.py. q26 keeps its
# full DuckDB hash oracle via full_registry().
EXTRA_QUERIES: dict[str, Query] = {}
EXTRA_QUERIES["q26_range_join"] = QUERIES.pop("q26_range_join")
