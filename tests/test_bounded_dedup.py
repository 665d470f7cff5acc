"""Bounded-state streaming dedup (streaming/dedup_stream.py).

Proves the round-5 scale-safety claim for the q73/q74/q75 family:
``dropDuplicatesWithinWatermark`` state EVICTS once the watermark passes
a key's event time (numRowsRemoved > 0, numRowsTotal shrinks), a key
re-arriving after eviction is re-emitted (the documented bounded-memory
contract), and the bounded wrappers stay result-identical to their
unbounded oracle twins when the horizon covers the whole replay.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from anti_ddos_spark.streaming.dedup_stream import (
    bounded_dedup,
    bounded_embedding_buckets,
    bounded_exact_dedup,
    bounded_minhash_buckets,
)
from tests.conftest import SF_DIR

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(path: str, rows: list[tuple[str, dt.datetime]], mtime: int) -> None:
    df = pd.DataFrame(rows, columns=["digest", "ts"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(path, index=False)
    # FileStreamSource orders files by modification time: pin an explicit,
    # strictly increasing mtime per batch so the 3 files become 3 ordered
    # micro-batches under maxFilesPerTrigger=1.
    os.utime(path, (mtime, mtime))


def _run_to_memory(spark, deduped, name: str, ckpt: str):
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(240)
    if not finished:
        q.stop()
        q.awaitTermination(60)
        raise RuntimeError("bounded-dedup stream did not finish in 240 s")
    return q


def test_watermark_ttl_evicts_state_and_readmits(spark, tmp_path):
    """Three micro-batches 500 s apart, 10 s watermark delay: batch-0
    state must be evicted by the time batch-2 runs, and a batch-0 key
    re-arriving in batch-2 must be emitted a second time."""
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: duplicate A within the batch (exact-dedup check), plus B
    _write_batch(
        str(src / "b0.parquet"),
        [("A", T0), ("A", T0 + dt.timedelta(seconds=5)), ("B", T0 + dt.timedelta(seconds=10))],
        mtime=1_000_000_000,
    )
    # batch 1: advances max event time to t+500 → the NEXT batch runs with
    # watermark t+490, far past batch-0's state rows
    _write_batch(
        str(src / "b1.parquet"),
        [("C", T0 + dt.timedelta(seconds=500))],
        mtime=1_000_000_100,
    )
    # batch 2: runs at watermark t+490 — batch-0 state is evicted at this
    # batch's END (dedup checks state before end-of-batch eviction, so A
    # must re-arrive one batch later still)
    _write_batch(
        str(src / "b2.parquet"),
        [("D", T0 + dt.timedelta(seconds=1000))],
        mtime=1_000_000_200,
    )
    # batch 3: A again, after its state row died
    _write_batch(
        str(src / "b3.parquet"),
        [("A", T0 + dt.timedelta(seconds=1500)), ("E", T0 + dt.timedelta(seconds=1500))],
        mtime=1_000_000_300,
    )

    stream = (
        spark.readStream.schema("digest STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = bounded_dedup(stream, ["digest"], event_time="ts", delay="10 seconds")
    q = _run_to_memory(spark, deduped, "bounded_ttl", str(tmp_path / "ckpt"))

    out = [
        (r["digest"], r["ts"])
        for r in spark.table("bounded_ttl").orderBy("ts", "digest").collect()
    ]
    digests = [d for d, _ in out]
    # within-batch duplicate removed: A once in batch 0
    assert digests.count("A") == 2, f"expected A re-admitted after eviction: {out}"
    assert sorted(set(digests)) == ["A", "B", "C", "D", "E"]
    assert len(out) == 6  # 2+2+2, the only suppressed row is batch-0's dup A

    # state metrics: rows were evicted and the store shrank
    progress = [json.loads(p.json) for p in q.recentProgress]
    stats = [
        (p["stateOperators"][0]["numRowsTotal"], p["stateOperators"][0]["numRowsRemoved"])
        for p in progress
        if p.get("stateOperators")
    ]
    assert stats, "no stateOperators progress recorded"
    removed = sum(r for _, r in stats)
    totals = [t for t, _ in stats]
    assert removed > 0, f"no state eviction observed: {stats}"
    assert min(totals[1:] or totals) < max(totals) or removed >= 3, (
        f"state never shrank: {stats}"
    )


@pytest.fixture(scope="module")
def docs_pdf():
    df = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
    df["ts"] = pd.Timestamp(T0).as_unit("us")
    return df


def test_bounded_exact_dedup_matches_unbounded(spark, tmp_path, docs_pdf):
    """Horizon covering the whole replay → digest set identical to batch
    DISTINCT (the q73 oracle semantics)."""
    src = tmp_path / "docs"
    src.mkdir()
    docs_pdf.to_parquet(str(src / "d.parquet"), index=False)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP").parquet(str(src))
    deduped = bounded_exact_dedup(stream, delay="365 days")
    _run_to_memory(spark, deduped, "bounded_exact", str(tmp_path / "ckpt"))
    got = {r["digest"] for r in spark.table("bounded_exact").collect()}
    want = {
        r["digest"]
        for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.md5("text").alias("digest"))
        .distinct()
        .collect()
    }
    assert got == want


def test_bounded_minhash_buckets_match_batch(spark, tmp_path, docs_pdf):
    """Bounded bucket state over one availableNow replay = the batch
    banded-signature bucket set (q74 semantics)."""
    from anti_ddos_spark.operators.dedup import minhash_banded_narrow

    src = tmp_path / "docs"
    src.mkdir()
    docs_pdf.to_parquet(str(src / "d.parquet"), index=False)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP").parquet(str(src))
    deduped = bounded_minhash_buckets(stream, delay="365 days")
    assert deduped.isStreaming
    _run_to_memory(spark, deduped, "bounded_mh", str(tmp_path / "ckpt"))
    got = {
        (r["band_id"], r["band_key"])
        for r in spark.table("bounded_mh").select("band_id", "band_key").collect()
    }
    batch_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    want = {
        (r["band_id"], r["band_key"])
        for r in minhash_banded_narrow(batch_docs)
        .select("band_id", "band_key")
        .distinct()
        .collect()
    }
    assert got == want


def test_bounded_embedding_buckets_match_batch(spark, tmp_path):
    """Bounded semantic-bucket state = the batch literal-plane signature
    set (q75 semantics), planes pinned to the oracle 'data' planes."""
    from anti_ddos_spark.operators.similarity import (
        as_double,
        literal_plane_band_sigs,
    )
    from anti_ddos_spark.queries.similarity import (
        NEARDUP_BANDS,
        NEARDUP_PLANES_PER_BAND,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_planes = NEARDUP_BANDS * NEARDUP_PLANES_PER_BAND
    planes = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_planes))
        .orderBy("vec_id")
        .collect()
    ]

    pdf = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))[["vec_id", "embedding"]]
    pdf["embedding"] = pdf["embedding"].map(list)
    pdf["ts"] = pd.Timestamp(T0).as_unit("us")
    src = tmp_path / "vecs"
    src.mkdir()
    pdf.to_parquet(str(src / "v.parquet"), index=False)

    stream = spark.readStream.schema(
        "vec_id BIGINT, embedding ARRAY<DOUBLE>, ts TIMESTAMP"
    ).parquet(str(src))
    deduped = bounded_embedding_buckets(
        stream, planes, NEARDUP_PLANES_PER_BAND, delay="365 days"
    )
    _run_to_memory(spark, deduped, "bounded_emb", str(tmp_path / "ckpt"))
    got = {
        (r["band_id"], r["sig"])
        for r in spark.table("bounded_emb").select("band_id", "sig").collect()
    }
    want = {
        (r["s"]["band_id"], r["s"]["sig"])
        for r in emb.select(
            F.explode(
                literal_plane_band_sigs(
                    as_double(F.col("embedding")), planes, NEARDUP_PLANES_PER_BAND
                )
            ).alias("s")
        )
        .distinct()
        .collect()
    }
    assert got == want
