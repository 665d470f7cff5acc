"""O(1)-state accumulator sessionizer ≡ batch whole-flow features.

Only the sumsq-derived std/variance features may differ ±1 from the
exact two-pass batch numbers (documented catastrophic-cancellation
band); every other of the 85 columns must match exactly.
"""

from __future__ import annotations

import os
import time

from anti_ddos_spark.schemas import PACKET_SCHEMA
from anti_ddos_spark.streaming.sessionize_stream import flow_features_arrayagg
from anti_ddos_spark.streaming.stateful_accum import stateful_flow_features_accum
from tests.conftest import make_packets

TIMEOUT_MS = 8_000
WAIT_S = 90


def test_accum_finals_match_batch(spark, tmp_path):
    rows = make_packets()
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(rows, PACKET_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(PACKET_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_flow_features_accum(stream, timeout_ms=TIMEOUT_MS)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("accum_flows")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        want_df = flow_features_arrayagg(
            spark.createDataFrame(rows, PACKET_SCHEMA), gap_s=None
        )
        cols = want_df.columns
        want = sorted(tuple(str(v) for v in r) for r in want_df.collect())
        n_flows = len(want)

        deadline = time.time() + WAIT_S
        got_df = None
        while time.time() < deadline:
            got_df = spark.table("accum_flows")
            if got_df.filter("is_final").count() >= n_flows:
                break
            time.sleep(2)
        finals = got_df.filter("is_final")
        assert finals.count() == n_flows, (
            f"expected {n_flows} finals, got {finals.count()}"
        )
        got = sorted(tuple(str(v) for v in r) for r in finals.select(*cols).collect())
        fuzzy = {i for i, c in enumerate(cols) if "std" in c or "variance" in c}
        for ra, rb in zip(got, want):
            for i, (va, vb) in enumerate(zip(ra, rb)):
                if va == vb:
                    continue
                assert i in fuzzy, f"{cols[i]}: stream={va} batch={vb}"
                assert abs(int(va) - int(vb)) <= max(2, int(int(vb) * 0.001)), (
                    f"{cols[i]}: stream={va} batch={vb}"
                )
        # partial rows existed before finals
        assert got_df.filter("not is_final").count() > 0
    finally:
        q.stop()
        q.awaitTermination(30)
