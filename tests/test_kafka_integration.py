"""Kafka-in → engine → Kafka-out integration (reference parity S1/S8).

The reference's production pipeline is Kafka on both ends
(spark_app/main.py:1023-1028 consumes ddos_packets_raw;
indexer/indexer.py:26-33 consumes ddos_result). This test drives the
same round trip with OUR builders:

    batch Kafka write (fixture packets as JSON)
      → kafka_packet_stream (S1 source + S2 decode)
      → stateful accumulator sessionizer
      → label_predictions contract columns
      → kafka_sink (S8)
      → batch Kafka read-back + JSON decode, assertions

Skipped automatically when no broker answers on $KAFKA_BOOTSTRAP
(default localhost:9092) or when the spark-sql-kafka package is not on
the classpath — see docs/KAFKA.md for the docker-compose + spark-submit
recipe that makes it run.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid

import pytest

from anti_ddos_spark.schemas import PACKET_SCHEMA
from tests.conftest import make_packets

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _broker_reachable(),
    reason=f"no Kafka broker at {BOOTSTRAP} (see docs/KAFKA.md)",
)


def test_kafka_roundtrip_flow_features(spark, tmp_path):
    from pyspark.sql import functions as F

    from anti_ddos_spark.sources.packets import TIMESTAMP_FMT, kafka_packet_stream
    from anti_ddos_spark.sources.sinks import kafka_sink, label_predictions
    from anti_ddos_spark.streaming.stateful_accum import stateful_flow_features_accum

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"ddos_packets_raw_{run}", f"ddos_result_{run}"

    rows = make_packets()
    packets = spark.createDataFrame(rows, PACKET_SCHEMA)

    # produce fixture packets with Spark's own Kafka batch writer (no
    # kafka-python needed), JSON-encoded like the reference producer
    try:
        (
            packets.select(
                F.to_json(
                    F.struct("*"), {"timestampFormat": TIMESTAMP_FMT}
                ).alias("value")
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("topic", topic_in)
            .save()
        )
    except Exception as ex:  # pragma: no cover - classpath-dependent
        if "Failed to find data source" in str(ex) or "kafka" in str(ex).lower():
            pytest.skip(
                "spark-sql-kafka package not on classpath "
                "(run with --packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
            )
        raise

    src = kafka_packet_stream(spark, BOOTSTRAP, topic_in, starting_offsets="earliest")
    flows = stateful_flow_features_accum(src, timeout_ms=3_600_000)
    scored = label_predictions(
        flows.withColumn(
            "prediction",
            (F.col("total_fwd_packets") + F.col("total_backward_packets") > 20)
            .cast("double"),
        )
    )
    q = kafka_sink(
        scored, BOOTSTRAP, topic_out, checkpoint=str(tmp_path / "ck")
    )
    try:
        deadline = time.time() + 120
        out = None
        want_flows = packets.select(
            "src_ip", "dst_ip", "src_port", "dst_port", "protocol"
        ).distinct()
        # flow keys are direction-normalized; count unique normalized keys
        from anti_ddos_spark.normalize import FLOW_KEY_COLS, normalize_flow_key

        n_flows = (
            normalize_flow_key(packets).select(*FLOW_KEY_COLS).distinct().count()
        )
        while time.time() < deadline:
            out = (
                spark.read.format("kafka")
                .option("kafka.bootstrap.servers", BOOTSTRAP)
                .option("subscribe", topic_out)
                .option("startingOffsets", "earliest")
                .load()
            )
            if out.count() >= n_flows:
                break
            time.sleep(3)
        vals = [json.loads(r.value) for r in out.select("value").collect()]
        assert len(vals) >= n_flows
        # the scored-NDJSON contract the downstream indexer consumes
        for v in vals[:5]:
            assert {"flow_id", "prediction", "label_name"} <= v.keys()
            assert v["label_name"] in ("DDoS", "Normal")
    finally:
        q.stop()
        q.awaitTermination(30)
