"""Schema registry — the typed contracts of the engine.

The packet schema mirrors the reference's Kafka JSON contract
(reference: DATA_CONTRACT.md:7-36, spark_app/main.py:21-49); the flow
schema mirrors its 85-column sessionizer output
(reference: spark_app/main.py:54-138, feature names also in
spark_app/ml_model/expected_features.txt). We keep timestamps as
TimestampType end-to-end and use real numeric types — no JSON-in-string
state smuggling (the reference serialized arrays into StringType state,
main.py:163-223; our design has no explicit state at all for batch).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Packet relation: one row per IP packet (streaming input / batch twin).
# ---------------------------------------------------------------------------

TCP_FLAG_FIELDS = [
    "cwr_flag",
    "ece_flag",
    "urg_flag",
    "ack_flag",
    "psh_flag",
    "rst_flag",
    "syn_flag",
    "fin_flag",
]

PACKET_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("src_ip", T.StringType(), False),
        T.StructField("dst_ip", T.StringType(), False),
        T.StructField("length", T.IntegerType(), False),
        T.StructField("protocol", T.IntegerType(), False),  # 6=TCP, 17=UDP
        T.StructField("src_port", T.IntegerType(), False),
        T.StructField("dst_port", T.IntegerType(), False),
        T.StructField("udp_len", T.IntegerType(), True),
        T.StructField("tcp_seq", T.IntegerType(), True),
        T.StructField("tcp_ack", T.IntegerType(), True),
        T.StructField("tcp_win", T.IntegerType(), True),
        T.StructField("tcp_len", T.IntegerType(), True),
    ]
    + [T.StructField(f, T.IntegerType(), True) for f in TCP_FLAG_FIELDS]
)

# ---------------------------------------------------------------------------
# Flow relation: identity columns + the 77-feature surface.
# Names and order follow the reference output schema exactly so a consumer
# of the reference (e.g. its RandomForest model contract) can switch over.
# ---------------------------------------------------------------------------

FLOW_IDENTITY_FIELDS = [
    T.StructField("flow_id", T.StringType(), False),
    T.StructField("source_ip", T.StringType(), False),
    T.StructField("source_port", T.IntegerType(), False),
    T.StructField("destination_ip", T.StringType(), False),
    T.StructField("destination_port", T.IntegerType(), False),
    T.StructField("protocol", T.IntegerType(), False),
    T.StructField("timestamp", T.TimestampType(), False),
]

# feature name -> Spark type ("int" or "long"), in reference output order.
FLOW_FEATURES: list[tuple[str, str]] = [
    ("total_fwd_packets", "int"),
    ("total_backward_packets", "int"),
    ("total_length_of_fwd_packets", "long"),
    ("total_length_of_bwd_packets", "long"),
    ("fwd_packet_length_max", "long"),
    ("fwd_packet_length_min", "long"),
    ("fwd_packet_length_mean", "long"),
    ("fwd_packet_length_std", "long"),
    ("bwd_packet_length_max", "long"),
    ("bwd_packet_length_min", "long"),
    ("bwd_packet_length_mean", "long"),
    ("bwd_packet_length_std", "long"),
    ("flow_bytes_s", "long"),
    ("flow_packets_s", "long"),
    ("flow_iat_mean", "long"),
    ("flow_iat_std", "long"),
    ("flow_iat_max", "long"),
    ("flow_iat_min", "long"),
    ("fwd_iat_total", "long"),
    ("fwd_iat_mean", "long"),
    ("fwd_iat_std", "long"),
    ("fwd_iat_max", "long"),
    ("fwd_iat_min", "long"),
    ("bwd_iat_total", "long"),
    ("bwd_iat_mean", "long"),
    ("bwd_iat_std", "long"),
    ("bwd_iat_max", "long"),
    ("bwd_iat_min", "long"),
    ("fwd_psh_flags", "int"),
    ("bwd_psh_flags", "int"),
    ("fwd_urg_flags", "int"),
    ("bwd_urg_flags", "int"),
    ("fwd_header_length", "int"),
    ("bwd_header_length", "int"),
    ("fwd_packets_s", "long"),
    ("bwd_packets_s", "long"),
    ("min_packet_length", "long"),
    ("max_packet_length", "long"),
    ("packet_length_mean", "long"),
    ("packet_length_std", "long"),
    ("packet_length_variance", "long"),
    ("fin_flag_count", "int"),
    ("syn_flag_count", "int"),
    ("rst_flag_count", "int"),
    ("psh_flag_count", "int"),
    ("ack_flag_count", "int"),
    ("urg_flag_count", "int"),
    ("cwe_flag_count", "int"),
    ("ece_flag_count", "int"),
    ("down_up_ratio", "long"),
    ("average_packet_size", "long"),
    ("avg_fwd_segment_size", "long"),
    ("avg_bwd_segment_size", "long"),
    ("fwd_avg_bytes_bulk", "long"),
    ("fwd_avg_packets_bulk", "long"),
    ("fwd_avg_bulk_rate", "long"),
    ("bwd_avg_bytes_bulk", "long"),
    ("bwd_avg_packets_bulk", "long"),
    ("bwd_avg_bulk_rate", "long"),
    ("subflow_fwd_packets", "int"),
    ("subflow_fwd_bytes", "int"),
    ("subflow_bwd_packets", "int"),
    ("subflow_bwd_bytes", "int"),
    ("init_win_bytes_forward", "int"),
    ("init_win_bytes_backward", "int"),
    ("act_data_pkt_fwd", "int"),
    ("min_seg_size_forward", "int"),
    ("active_mean", "long"),
    ("active_std", "long"),
    ("active_max", "long"),
    ("active_min", "long"),
    ("idle_mean", "long"),
    ("idle_std", "long"),
    ("idle_max", "long"),
    ("idle_min", "long"),
]

_TYPE = {"int": T.IntegerType(), "long": T.LongType()}

FLOW_SCHEMA = T.StructType(
    FLOW_IDENTITY_FIELDS
    + [T.StructField(name, _TYPE[t], False) for name, t in FLOW_FEATURES]
)

FLOW_FEATURE_NAMES = [name for name, _ in FLOW_FEATURES]

# ---------------------------------------------------------------------------
# Events table (driver testdata): the sessionization stand-in stream.
# ---------------------------------------------------------------------------

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),  # JSON object string
    ]
)

# Embeddings table: vec_id, embedding array<float>, label.
EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
