"""Source/sink layer tests (SURVEY §2.1)."""

from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import functions as F

from anti_ddos_spark.sources.csv_clean import (
    clean_training_frame,
    read_training_csv,
    select_expected_features,
)
from anti_ddos_spark.sources.packets import (
    TIMESTAMP_FMT,
    json_packet_stream,
    rate_packet_stream,
)
from anti_ddos_spark.sources.sinks import (
    foreach_batch_ndjson,
    label_predictions,
    write_ndjson,
)
from anti_ddos_spark.schemas import PACKET_SCHEMA


CSV_TEXT = """\
Unnamed: 0, Flow Duration,Total Fwd.Packets, Label ,Flow ID
0,12.5,3, BENIGN ,a-b
1,Infinity,4,DrDoS_DNS,c-d
2,7.25,5, drdos_ntp ,e-f
3,-Infinity,6,BENIGN,g-h
4,9.0,7,Benign,i-j
"""


def test_csv_clean_pipeline(spark, tmp_path):
    p = tmp_path / "flows.csv"
    p.write_text(CSV_TEXT)
    raw = read_training_csv(spark, str(p))
    df = clean_training_frame(raw)
    # renamed + ids dropped
    assert set(df.columns) == {"Flow_Duration", "Total_Fwd_Packets", "Label", "binary_label"}
    rows = {r["Total_Fwd_Packets"]: r["binary_label"] for r in df.collect()}
    # inf rows (4, 6) scrubbed to null and dropped
    assert rows == {3: 0.0, 5: 1.0, 7: 0.0}


def test_select_expected_features(spark):
    df = spark.range(1).select(
        F.lit(1).alias("a"), F.lit(2).alias("b"), F.lit(3).alias("c")
    )
    out = select_expected_features(df, ["c", "missing", "a"])
    assert out.columns == ["c", "a"]


def test_ndjson_sink_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("double").alias("prediction")
    )
    out = str(tmp_path / "nd")
    write_ndjson(label_predictions(df), out)
    back = spark.read.json(out)
    assert back.count() == 100
    names = {r["label_name"] for r in back.select("label_name").distinct().collect()}
    assert names == {"DDoS", "Normal"}


def test_json_packet_stream_decode(spark, packets_df, tmp_path):
    """NDJSON lines through decode_packets == original typed rows (S2)."""
    src = str(tmp_path / "nd_src")
    os.makedirs(src)
    rows = packets_df.limit(20).collect()
    with open(os.path.join(src, "part-0.txt"), "w") as f:
        for r in rows:
            d = r.asDict()
            d["timestamp"] = d["timestamp"].strftime("%Y-%m-%d %H:%M:%S.%f")
            f.write(json.dumps(d) + "\n")

    q = (
        json_packet_stream(spark, src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("decoded_pkts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.table("decoded_pkts")
    assert got.schema == PACKET_SCHEMA or [f.name for f in got.schema] == [
        f.name for f in PACKET_SCHEMA
    ]
    assert got.count() == 20
    assert got.filter(F.col("timestamp").isNull()).count() == 0
    a = sorted(map(str, packets_df.limit(20).collect()))
    b = sorted(map(str, got.collect()))
    assert a == b


def test_foreach_batch_ndjson(spark, packets_df, tmp_path):
    src = str(tmp_path / "pq")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    packets_df.write.parquet(src)
    stream = spark.readStream.schema(packets_df.schema).parquet(src)
    q = foreach_batch_ndjson(
        stream.select("src_ip", "dst_ip", "length"), out, ckpt
    )
    q.awaitTermination(60)
    files = glob.glob(os.path.join(out, "batch_id=*", "*.json"))
    assert files, "no NDJSON batch output written"
    back = spark.read.json(os.path.join(out, "batch_id=*"))
    assert back.count() == packets_df.count()


def test_rate_packet_stream_schema(spark):
    df = rate_packet_stream(spark)
    assert df.isStreaming
    assert [f.name for f in df.schema] == [f.name for f in PACKET_SCHEMA]
    assert [f.dataType for f in df.schema] == [f.dataType for f in PACKET_SCHEMA]


def test_es_bulk_payload_contract(spark, tmp_path):
    """S9: each written text file is a valid _bulk body — alternating
    action/doc lines, action._id matches the following doc's id, every
    input row present exactly once."""
    import glob
    import json

    from anti_ddos_spark.sources.sinks import write_es_bulk

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "lang")
    )
    out = str(tmp_path / "bulk")
    write_es_bulk(docs, out, index="corpus", id_col="doc_id",
                  max_records_per_file=10)
    seen = {}
    for f in glob.glob(out + "/*.txt") + glob.glob(out + "/part-*"):
        lines = [l for l in open(f).read().splitlines() if l]
        assert len(lines) % 2 == 0, f"odd line count in {f}"
        for a, d in zip(lines[::2], lines[1::2]):
            action, doc = json.loads(a), json.loads(d)
            assert set(action) == {"index"}
            assert action["index"]["_index"] == "corpus"
            assert action["index"]["_id"] == str(doc["doc_id"])
            seen[doc["doc_id"]] = doc
    rows = {r["doc_id"]: r.asDict() for r in docs.collect()}
    assert seen.keys() == rows.keys()
    for k, v in rows.items():
        assert seen[k] == v

    import pytest

    with pytest.raises(ValueError):
        write_es_bulk(docs, out + "2", "corpus", "doc_id",
                      max_records_per_file=7)
