"""Streaming throughput soak (BASELINE.md "streaming proxy" target).

Drives the rate source through the full detection plan — sessionizer +
77-feature extraction (+ optionally RF scoring) — at a configured
rows/sec for a fixed wall duration, then reports whether the pipeline
kept up: sustained processedRowsPerSecond, mean batch duration vs the
trigger interval, and end-of-run backlog.

Usage:  python bench_stream.py [rows_per_sec] [duration_s] [mode]
        mode ∈ session_window | stateful      (default session_window)

Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    duration_s = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    mode = sys.argv[3] if len(sys.argv) > 3 else "session_window"

    from anti_ddos_spark.session import get_spark
    from anti_ddos_spark.sources.packets import rate_packet_stream
    from anti_ddos_spark.streaming.sessionize_stream import streaming_flow_features
    from anti_ddos_spark.streaming.stateful import stateful_flow_features
    from anti_ddos_spark.streaming.stateful_accum import stateful_flow_features_accum

    # Streaming micro-batches are small; 32 shuffle partitions would give
    # sub-MB state partitions and per-task overhead dominates. 8 is sized
    # for local mode; a cluster deployment scales this with executor count.
    spark = get_spark(app_name="bench_stream", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    packets = rate_packet_stream(spark, rows_per_second=rows_per_sec)
    if mode == "session_window":
        flows = streaming_flow_features(packets, gap_s=5, watermark="0 seconds")
        out_mode = "append"
    elif mode == "accum":
        flows = stateful_flow_features_accum(packets, timeout_ms=5_000)
        out_mode = "update"
    else:
        flows = stateful_flow_features(packets, timeout_ms=5_000)
        out_mode = "update"

    ckpt = tempfile.mkdtemp(prefix="bench_stream_ck_")
    q = (
        flows.writeStream.outputMode(out_mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(duration_s)
    progress = [p for p in q.recentProgress]
    q.stop()
    q.awaitTermination(30)

    # skip the first 5 batches (codegen + state warmup)
    steady = progress[5:] if len(progress) > 8 else progress
    proc = [p["processedRowsPerSecond"] for p in steady if p["numInputRows"] > 0]
    durs = [p["batchDuration"] / 1000.0 for p in steady if p["numInputRows"] > 0]
    backlog_batches = [p for p in steady if p["batchDuration"] > 2_000]
    out = {
        "metric": "stream_sustained_rows_per_sec",
        "value": round(statistics.median(proc), 1) if proc else 0.0,
        "unit": "rows/sec",
        "mode": mode,
        "offered_rows_per_sec": rows_per_sec,
        "batches": len(progress),
        "mean_batch_s": round(statistics.mean(durs), 2) if durs else None,
        "slow_batches_gt_2x_trigger": len(backlog_batches),
        "kept_up": bool(durs) and statistics.mean(durs) < 2.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
