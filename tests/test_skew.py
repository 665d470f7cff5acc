"""Skewed-flow behavior of the batch sessionizer (VERDICT r1 item 8).

A DDoS victim is the canonical skew case: one 5-tuple holding ~50% of
all packets. The window chain partitions by flow key, so a hot flow is
inherently sequential — the documented mitigation (sessionize.py:22-25)
is that the >gap session split bounds per-key RUN length, not task
count. This test pins both halves of that claim:

1. correctness under skew: the hot flow's packets split into the exact
   number of gap-delimited sessions, with per-session packet counts
   conserved (nothing merged or dropped);
2. bounded degradation: wall-time on the skewed layout stays within a
   small factor of a balanced layout of identical total size. The bound
   is deliberately loose (4×) — it catches quadratic/accumulating
   pathologies, not scheduler noise.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from anti_ddos_spark.schemas import PACKET_SCHEMA
from anti_ddos_spark.sessionize import flow_features

N_TOTAL = 60_000
HOT_SHARE = 0.5
N_SESSIONS = 5  # hot flow's packets arrive in 5 bursts > gap apart
GAP_S = 60


def _packets(spark, skewed: bool):
    """N_TOTAL synthetic packets. skewed=True: half on one 5-tuple (in
    N_SESSIONS bursts separated by >gap silences), half across 1000
    background flows. skewed=False: all uniform across 1000 flows."""
    n_hot = int(N_TOTAL * HOT_SHARE) if skewed else 0
    n_bg = N_TOTAL - n_hot
    base_us = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)

    bg = (
        spark.range(n_bg)
        .select(
            F.timestamp_micros(
                F.lit(base_us) + (F.col("id") * 1000) % (3600 * 1_000_000)
            ).alias("timestamp"),
            F.concat(F.lit("10.1."), ((F.col("id") % 1000) / 250).cast("int").cast("string"),
                     F.lit("."), (F.col("id") % 250).cast("string")).alias("src_ip"),
            F.lit("10.9.9.9").alias("dst_ip"),
            F.lit(400).cast("int").alias("length"),
            F.lit(6).cast("int").alias("protocol"),
            (F.lit(1024) + (F.col("id") % 1000)).cast("int").alias("src_port"),
            F.lit(80).cast("int").alias("dst_port"),
        )
    )
    parts = [bg]
    if n_hot:
        burst_len_us = 10 * 1_000_000  # 10 s of traffic per burst
        per_burst = n_hot // N_SESSIONS
        hot = (
            spark.range(n_hot)
            .select(
                F.timestamp_micros(
                    F.lit(base_us)
                    # burst index jumps by (gap+30)s, packets spread inside 10 s
                    + (F.col("id") / per_burst).cast("long") * ((GAP_S + 30) * 1_000_000)
                    + ((F.col("id") % per_burst) * burst_len_us / per_burst).cast("long")
                ).alias("timestamp"),
                F.lit("203.0.113.7").alias("src_ip"),
                F.lit("10.9.9.9").alias("dst_ip"),
                F.lit(1400).cast("int").alias("length"),
                F.lit(6).cast("int").alias("protocol"),
                F.lit(55555).cast("int").alias("src_port"),
                F.lit(80).cast("int").alias("dst_port"),
            )
        )
        parts.append(hot)
    df = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    for f in PACKET_SCHEMA.fieldNames():
        if f not in df.columns:
            df = df.withColumn(f, F.lit(None).cast(dict(
                (x.name, x.dataType) for x in PACKET_SCHEMA.fields)[f]))
    return df.select(*PACKET_SCHEMA.fieldNames())


def _timed_run(spark, skewed: bool) -> tuple[float, list]:
    df = _packets(spark, skewed)
    t0 = time.monotonic()
    rows = flow_features(df, gap_s=GAP_S).collect()
    return time.monotonic() - t0, rows


def test_hot_flow_gap_split_bounds_run_length(spark):
    _, rows = _timed_run(spark, skewed=True)
    hot = [r for r in rows if r["source_ip"] == "203.0.113.7"]
    assert len(hot) == N_SESSIONS, (
        f"hot 5-tuple must split into {N_SESSIONS} gap-delimited sessions, "
        f"got {len(hot)}"
    )
    n_hot = int(N_TOTAL * HOT_SHARE)
    assert sum(r["total_fwd_packets"] + r["total_backward_packets"] for r in hot) == n_hot
    # every session's run length is bounded by the burst size — the
    # mitigation claim: no single window run spans the whole hot flow
    for r in hot:
        assert (
            r["total_fwd_packets"] + r["total_backward_packets"]
            <= n_hot // N_SESSIONS + 1
        )


def test_skewed_walltime_bounded(spark):
    # warm both paths once (codegen compile dominates cold runs)
    _timed_run(spark, skewed=False)
    _timed_run(spark, skewed=True)

    t_flat = min(_timed_run(spark, skewed=False)[0] for _ in range(2))
    t_skew = min(_timed_run(spark, skewed=True)[0] for _ in range(2))
    # relative-timing bound: generous additive slack because a contended
    # box (e.g. the full suite racing another Spark job) can stretch one
    # side's min-of-2 by seconds without any plan regression
    assert t_skew <= max(4.0 * t_flat, t_flat + 5.0), (
        f"skewed layout {t_skew:.2f}s vs balanced {t_flat:.2f}s — "
        "per-key sequential cost is no longer bounded by the gap split"
    )
