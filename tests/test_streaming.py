"""Batch ≡ array-batch ≡ streaming equivalence for the flow sessionizer."""

from __future__ import annotations

import os
import tempfile

import pytest

from anti_ddos_spark.schemas import FLOW_SCHEMA
from anti_ddos_spark.sessionize import flow_features
from anti_ddos_spark.streaming.sessionize_stream import (
    flow_features_arrayagg,
    streaming_flow_features,
)

GAP_S = 60

COLS = [f.name for f in FLOW_SCHEMA.fields]
# int-truncated float statistics: Welford (window agg) vs two-pass (array
# expr) std differ by sub-ulp fp noise, so the floor can flip by one unit.
FUZZY = {
    i
    for i, c in enumerate(COLS)
    if "std" in c or "variance" in c
}


def _canon(df):
    rows = df.select(*COLS).collect()
    return sorted(tuple(str(v) for v in r) for r in rows)


def _assert_rows_equal(ra, rb):
    for i, (va, vb) in enumerate(zip(ra, rb)):
        if va == vb:
            continue
        if i in FUZZY and abs(int(va) - int(vb)) <= 1:
            continue
        raise AssertionError(f"field {COLS[i]}: {va} != {vb}\n{ra[:8]}")


def test_batch_window_vs_arrayagg(spark, packets_df):
    a = _canon(flow_features(packets_df, gap_s=GAP_S))
    b = _canon(flow_features_arrayagg(packets_df, gap_s=GAP_S))
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        _assert_rows_equal(ra, rb)


def test_streaming_availablenow_matches_batch(spark, packets_df):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "packets")
        ckpt = os.path.join(tmp, "ckpt")
        packets_df.write.parquet(src)

        stream = (
            spark.readStream.schema(packets_df.schema).parquet(src)
        )
        # fixture spans ~100 s, so a 0 s watermark delay is required for
        # any session end to fall behind the final watermark in one pass
        out = streaming_flow_features(stream, gap_s=GAP_S, watermark="0 seconds")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("flows_stream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = _canon(spark.sql("SELECT * FROM flows_stream"))
        want = _canon(flow_features_arrayagg(packets_df, gap_s=GAP_S))
        # A single availableNow pass finalizes every session whose end
        # precedes the final watermark; with bounded input the watermark
        # advances past max(ts) only on the *next* trigger, so append
        # mode may withhold trailing sessions. Accept a subset match but
        # require substantial coverage.
        assert len(got) > 0, "streaming emitted nothing"
        # substantial coverage, asserted: only sessions within gap+0s-
        # watermark of the fixture's end may legitimately be withheld
        assert len(got) >= 0.6 * len(want), f"under-emission: {len(got)}/{len(want)}"
        want_set = set(want)
        for row in got:
            assert row in want_set, f"streaming row not in batch output: {row[:8]}"


def test_streaming_two_pass_emits_everything(spark, packets_df):
    """Re-running the stream after the watermark advanced (second
    availableNow trigger on the same checkpoint) finalizes all sessions."""
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "packets")
        ckpt = os.path.join(tmp, "ckpt")
        packets_df.write.parquet(src)
        # add a late "flush" packet far in the future for one unrelated key
        flush = spark.createDataFrame(
            [packets_df.orderBy("timestamp").collect()[-1]], packets_df.schema
        )
        from pyspark.sql import functions as F

        flush = flush.withColumn(
            "timestamp", F.col("timestamp") + F.expr("INTERVAL 1 HOUR")
        ).withColumn("src_ip", F.lit("99.99.99.99"))
        flush.write.mode("append").parquet(src)

        stream = spark.readStream.schema(packets_df.schema).parquet(src)
        out = streaming_flow_features(stream, gap_s=GAP_S, watermark="0 seconds")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("flows_stream2")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("SELECT * FROM flows_stream2")
        want = flow_features_arrayagg(packets_df, gap_s=GAP_S)
        # all original flows must be final now (flush key excluded)
        got_n = got.filter("source_ip != '99.99.99.99'").count()
        assert got_n == want.count()


def test_state_partitions_policy_matches_the_measured_ladder():
    """r7 verdict task #6: the round-7 cardinality ladder's lever as a
    policy. Pin the three measured ladder points (1k/10k/100k flows on
    the 32-core box) and the clamp behavior."""
    from anti_ddos_spark.session import state_partitions_for

    assert state_partitions_for(1_000, cores=32) == 8     # task overhead regime
    assert state_partitions_for(10_000, cores=32) == 8    # still fine at 8 (measured)
    assert state_partitions_for(100_000, cores=32) == 32  # the recovery point
    # cluster arithmetic: 10M keys over 512 cores → capped at cores
    assert state_partitions_for(10_000_000, cores=512) == 512
    # in between: grows with keys, never below the floor
    assert state_partitions_for(50_000, cores=64) == 16
    assert state_partitions_for(1, cores=4) == 8  # floor wins on tiny hosts
