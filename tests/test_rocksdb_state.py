"""RocksDB state store provider ≡ default provider for the streaming paths.

The production answer to >10M open flows (PERF.md "Known gaps"): state
off-heap/on-disk with changelog checkpointing instead of executor heap.
Correctness bar: the applyInPandasWithState accumulator sessionizer and
the session_window path must produce identical output under RocksDB,
and the checkpoint must actually contain RocksDB changelog files (so a
misconfigured provider can't silently pass as the default one).
"""

from __future__ import annotations

import glob
import os
import time

import pytest

from anti_ddos_spark.schemas import PACKET_SCHEMA
from anti_ddos_spark.session import rocksdb_conf
from anti_ddos_spark.streaming.sessionize_stream import flow_features_arrayagg
from anti_ddos_spark.streaming.stateful_accum import stateful_flow_features_accum
from tests.conftest import make_packets

TIMEOUT_MS = 3_600_000  # beyond test duration → partials only, deterministic


@pytest.fixture
def rocksdb(spark):
    """Apply the RocksDB provider for queries started inside the test,
    restoring the session's prior state-store conf afterwards."""
    prior = {}
    for k, v in rocksdb_conf().items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in prior.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_accum_under_rocksdb_matches_batch(spark, tmp_path, rocksdb):
    rows = make_packets()
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    spark.createDataFrame(rows, PACKET_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(PACKET_SCHEMA).parquet(src)
    out = stateful_flow_features_accum(stream, timeout_ms=TIMEOUT_MS)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("rocks_accum_flows")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        want_df = flow_features_arrayagg(
            spark.createDataFrame(rows, PACKET_SCHEMA), gap_s=None
        )
        cols = want_df.columns
        want = sorted(tuple(str(v) for v in r) for r in want_df.collect())

        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("rocks_accum_flows").count() >= len(want):
                break
            time.sleep(1)
        q.stop()
        q.awaitTermination(30)

        got_df = spark.table("rocks_accum_flows")
        got = sorted(
            tuple(str(v) for v in r) for r in got_df.select(*cols).collect()
        )
        assert len(got) == len(want), (len(got), len(want))
        fuzzy = {i for i, c in enumerate(cols) if "std" in c or "variance" in c}
        for ra, rb in zip(got, want):
            for i, (va, vb) in enumerate(zip(ra, rb)):
                if va == vb:
                    continue
                assert i in fuzzy, f"{cols[i]}: rocksdb={va} batch={vb}"
                assert abs(int(va) - int(vb)) <= max(2, int(int(vb) * 0.001))

        # prove the RocksDB provider actually ran: changelog checkpointing
        # writes N.changelog per batch; the HDFS provider writes N.delta
        state_files = glob.glob(os.path.join(ck, "state", "**", "*"), recursive=True)
        assert any(f.endswith(".changelog") for f in state_files), state_files
        assert not any(f.endswith(".delta") for f in state_files), state_files
    finally:
        if q.isActive:
            q.stop()
            q.awaitTermination(30)
