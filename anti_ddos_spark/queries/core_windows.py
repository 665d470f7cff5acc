"""Window-function queries: the full rank family, time-spine gap fill,
unpivot, value windows with explicit frames, RANGE frames, dynamic-gap
session windows.

Split out of queries/core.py in round 6 (verdict task #5); see the
façade note in core_analytics.py - registry surface unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from anti_ddos_spark.queries.base import Query, rnd, sql_rnd, t

EXTRA_QUERIES: dict[str, Query] = {}


# --- q95: full rank-function family ---------------------------------------

def q95_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    """The four ranking windows the surface hadn't pinned together —
    rank / dense_rank / percent_rank / cume_dist — over an ordering
    with REAL ties (price bucketed to 1000s), where rank≠dense_rank and
    the distribution functions hit tied groups. Row set is made
    deterministic by a fully tie-broken row_number filter."""
    orders = t(spark, sf, "orders")
    bucket = F.floor(F.col("o_totalprice") / 1000).alias("price_k")
    wt = W.partitionBy("o_orderpriority").orderBy(
        F.col("price_k").desc()
    )
    wr = W.partitionBy("o_orderpriority").orderBy(
        F.col("price_k").desc(), F.col("o_orderkey").asc()
    )
    # every rank metric is computed over the FULL partition first; the
    # row_number filter only trims the emitted row set afterwards
    ranked = orders.select("o_orderpriority", "o_orderkey", bucket).select(
        "o_orderpriority",
        "o_orderkey",
        "price_k",
        F.row_number().over(wr).alias("rn"),
        F.rank().over(wt).cast("int").alias("rnk"),
        F.dense_rank().over(wt).cast("int").alias("drnk"),
        F.floor(F.percent_rank().over(wt) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("prank_x1e6"),
        F.floor(F.cume_dist().over(wt) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("cume_x1e6"),
    )
    return ranked.filter(F.col("rn") <= 5).drop("rn")


Q95_SQL = """
WITH b AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k
  FROM orders),
r AS (
  SELECT o_orderpriority, o_orderkey, price_k,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY price_k DESC, o_orderkey ASC) AS rn,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
           AS prank_x1e6,
         CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
           AS cume_x1e6
  FROM b
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_k DESC))
SELECT o_orderpriority, o_orderkey, price_k,
       CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk,
       prank_x1e6, cume_x1e6
FROM r WHERE rn <= 5
"""

EXTRA_QUERIES["q95_rank_family"] = Query(
    q95_rank_family,
    Q95_SQL,
    "rank / dense_rank / percent_rank / cume_dist over a tied ordering",
)


# --- q96: time-spine gap fill ---------------------------------------------

def q96_hourly_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap filling — generate the full hourly spine between
    the corpus bounds and left-join sparse activity onto it so silent
    hours surface as explicit zeros (a rate monitor that skips empty
    buckets can't alarm on silence). Sparse side: a ~1% event sample.
    The spine is sequence+explode of two scalar bounds — generated, not
    scanned; one broadcast of the bounds row."""
    ev = t(spark, sf, "events").filter(F.col("event_id") % 97 == 0)
    hours = ev.select(F.date_trunc("hour", "ts").alias("hour"))
    counts = hours.groupBy("hour").agg(F.count(F.lit(1)).alias("n"))
    # bounds from the GROUPED side keeps the second branch on the tiny
    # histogram; Spark still plans two scans of the sampled input (no
    # cross-branch exchange reuse here), which the plan pin bounds
    bounds = counts.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    return spine.join(counts, "hour", "left").select(
        F.unix_micros("hour").alias("hour_us"),
        F.coalesce("n", F.lit(0)).cast("int").alias("n"),
        (F.col("n").isNull()).cast("int").alias("is_gap"),
    )


Q96_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour
  FROM events WHERE event_id % 97 = 0),
bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM bounds),
c AS (SELECT hour, count(*) AS n FROM h GROUP BY hour)
SELECT epoch_us(spine.hour) AS hour_us,
       CAST(coalesce(c.n, 0) AS INT) AS n,
       CAST(c.n IS NULL AS INT) AS is_gap
FROM spine LEFT JOIN c ON spine.hour = c.hour
"""

EXTRA_QUERIES["q96_hourly_gap_fill"] = Query(
    q96_hourly_gap_fill,
    Q96_SQL,
    "hourly time-spine gap fill (generated calendar, silence as "
    "explicit zeros)",
)


# --- q97: unpivot (melt) --------------------------------------------------

def q97_unpivot_stats(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT — the inverse of q17's pivot, the remaining reshape
    primitive: a wide per-segment stats row (n_customers, acctbal sum,
    distinct nations) melted into (segment, metric, value) long form,
    the shape metric stores and plotting layers ingest. Narrow
    aggregate → constant-width melt; no extra shuffle beyond the agg."""
    wide = (
        t(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            # 2-dp fixed point (x100): a 0-dp floor(sum+0.5) would sit
            # on the exact-.5 boundary for 2-dp money inputs
            F.floor(F.sum("c_acctbal") * 100 + F.lit(0.5))
            .cast("long")
            .alias("acctbal_x100"),
            F.count_distinct("c_nationkey").cast("long").alias("n_nations"),
        )
    )
    return wide.unpivot(
        ["c_mktsegment"],
        ["n_customers", "acctbal_x100", "n_nations"],
        "metric",
        "value",
    )


Q97_SQL = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(floor(sum(c_acctbal) * 100 + 0.5) AS BIGINT) AS acctbal_x100,
         CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
  FROM customer GROUP BY c_mktsegment)
SELECT c_mktsegment, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_customers, acctbal_x100, n_nations))
"""

EXTRA_QUERIES["q97_unpivot_stats"] = Query(
    q97_unpivot_stats,
    Q97_SQL,
    "unpivot/melt (inverse of q17's pivot): wide stats to long form",
)


# --- q98: value window functions (first/last/nth with explicit frames) ----

def q98_value_windows(spark: SparkSession, sf: str) -> DataFrame:
    """first_value / last_value / nth_value with EXPLICIT frames — the
    classic frame-semantics trap: last_value over the default frame
    (unbounded preceding → current row) is just the current row, so the
    full-partition frame must be spelled out. Per user: first and last
    event type by time, and the 2nd event's type."""
    ev = t(spark, sf, "events").select("user_id", "event_type", "ts")
    full = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_type").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first_value("event_type").over(full).alias("first_type"),
            F.last_value("event_type").over(full).alias("last_type"),
            F.nth_value("event_type", 2).over(full).alias("second_type"),
        )
        .distinct()
    )


Q98_SQL = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_type ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

EXTRA_QUERIES["q98_value_windows"] = Query(
    q98_value_windows,
    Q98_SQL,
    "first/last/nth_value with explicit full-partition frames",
)


# --- q105: value-range window frame (RANGE BETWEEN) -----------------------

def q105_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frames — the by-VALUE window frame the surface hadn't
    pinned (ROWS frames count rows; RANGE bounds the ordering value):
    per user, how many events fell in the trailing 5-minute window at
    each event, plus the value sum over that window. Ordering key is
    epoch seconds so both engines share exact integer range bounds."""
    ev = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_seconds(F.col("ts")).alias("ts_s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v100"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-300, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_s",
        F.count(F.lit(1)).over(w).cast("int").alias("n_5min"),
        F.sum("v100").over(w).cast("long").alias("v100_5min"),
    )


Q105_SQL = """
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
       CAST(count(*) OVER w AS INT) AS n_5min,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
         AS v100_5min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 300 PRECEDING AND CURRENT ROW)
"""

EXTRA_QUERIES["q105_range_frame"] = Query(
    q105_range_frame,
    Q105_SQL,
    "RANGE window frame (trailing 5-minute by-value bounds, exact "
    "integer ordering key)",
)


# --- q111: dynamic-gap session windows ------------------------------------

def q111_dynamic_gap_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """session_window with a PER-ROW gap — the generalized form of the
    flow timeout (q20/q24 use a fixed gap): interactive event types
    keep sessions alive briefly (60 s), transactional ones longer
    (300 s). Uses Spark's native dynamic-gap session_window; the oracle
    replicates the merge rule exactly (a row joins the session while
    its start is before the running max of previous [ts+gap) ends —
    a running-max window + break-flag cumsum). Per user: session count
    and size distribution."""
    gap_s = F.when(F.col("event_type").isin("purchase", "signup"), 300).otherwise(60)
    ev = t(spark, sf, "events").select(
        "user_id",
        "ts",
        F.concat(gap_s.cast("string"), F.lit(" seconds")).alias("gap"),
    )
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", F.col("gap")).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sessions"),
        F.max("n_events").cast("int").alias("max_session_events"),
        F.sum("n_events").cast("int").alias("total_events"),
    )


Q111_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN 300000000 ELSE 60000000 END AS gap_us
  FROM events),
m AS (
  SELECT user_id, ts_us,
         max(ts_us + gap_us) OVER (
           PARTITION BY user_id ORDER BY ts_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM e),
b AS (
  SELECT user_id, ts_us,
         CASE WHEN prev_end IS NULL OR ts_us >= prev_end THEN 1 ELSE 0 END
           AS brk
  FROM m),
s AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM b),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM s GROUP BY user_id, session_id)
SELECT user_id, CAST(count(*) AS INT) AS n_sessions,
       CAST(max(n_events) AS INT) AS max_session_events,
       CAST(sum(n_events) AS INT) AS total_events
FROM per_session GROUP BY user_id
"""

EXTRA_QUERIES["q111_dynamic_gap_sessions"] = Query(
    q111_dynamic_gap_sessions,
    Q111_SQL,
    "dynamic-gap session windows (per-row gap; running-max merge-rule "
    "oracle)",
)


