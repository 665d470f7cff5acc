"""Multimodal query surface (media binary columns over `documents`).

q60 is metadata-only — at 100 TB it must never touch the payload bytes;
the parquet scan reads only doc_id/n_chars (column pruning; verify via
`.explain` ReadSchema). q61 drives the whole mapInPandas decode path and
is still hash-checked because the fake decode is deterministic from the
bytes (documents are ASCII, so DuckDB's VARCHAR md5/substr/ascii agree
with Spark's byte-level results). q62 exercises binary slicing (frame
sampling) as pure Catalyst substring-on-binary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from anti_ddos_spark.multimodal import decode_media, frame_sample, media_from_documents
from anti_ddos_spark.queries.base import Query, t

# SQL twin of media_from_documents' media_type derivation
_MT_SQL = "list_extract(['image','audio','video'], CAST(doc_id % 3 + 1 AS INT))"


def q60_media_profile(spark: SparkSession, sf: str) -> DataFrame:
    media = media_from_documents(t(spark, sf, "documents"))
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.sum(F.col("meta.width")).alias("sum_width"),
        F.sum(F.col("meta.duration_ms")).alias("sum_duration_ms"),
        F.countDistinct("meta.codec").alias("n_codecs"),
    )


Q60_SQL = f"""
SELECT {_MT_SQL}                    AS media_type,
       count(*)                     AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT)    AS total_bytes,
       CAST(sum(CASE WHEN {_MT_SQL} IN ('image','video')
                THEN CAST(n_chars % 640 + 16 AS INT) END) AS BIGINT) AS sum_width,
       CAST(sum(CASE WHEN {_MT_SQL} IN ('audio','video')
                THEN CAST(n_chars * 10 AS INT) END) AS BIGINT)       AS sum_duration_ms,
       count(DISTINCT CASE {_MT_SQL} WHEN 'image' THEN 'png'
                                     WHEN 'audio' THEN 'pcm16'
                                     ELSE 'h264' END)     AS n_codecs
FROM documents
GROUP BY 1
"""


def q61_media_features(spark: SparkSession, sf: str) -> DataFrame:
    media = media_from_documents(t(spark, sf, "documents"))
    feats = decode_media(media, impl="fake")
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("first_byte").alias("sum_first_byte"),
        F.countDistinct("digest8").alias("n_distinct_digests"),
        F.min("digest8").alias("min_digest"),
    )


Q61_SQL = f"""
SELECT {_MT_SQL}                         AS media_type,
       count(*)                          AS n_media,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(sum(ascii(substr(text, 1, 1))) AS BIGINT)  AS sum_first_byte,
       count(DISTINCT substr(md5(text), 1, 8)) AS n_distinct_digests,
       min(substr(md5(text), 1, 8))      AS min_digest
FROM documents
GROUP BY 1
"""


def q62_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = media_from_documents(t(spark, sf, "documents"))
    frames = frame_sample(media, n_frames=4, frame_bytes=32)
    return frames.select(
        "media_id",
        "frame_no",
        F.md5(F.col("frame")).alias("frame_digest"),
        F.octet_length("frame").alias("frame_bytes"),
    )


Q62_SQL = """
WITH vids AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n_bytes
  FROM documents WHERE doc_id % 3 = 2      -- media_type = 'video'
),
frames AS (
  SELECT media_id,
         f.frame_no,
         substr(text, CAST(floor(f.frame_no * n_bytes / 4) AS INT) + 1, 32) AS frame
  FROM vids, (SELECT unnest(range(4)) AS frame_no) f
)
SELECT media_id, frame_no, md5(frame) AS frame_digest,
       octet_length(encode(frame)) AS frame_bytes
FROM frames
"""


QUERIES: dict[str, Query] = {
    "q60_media_profile": Query(
        q60_media_profile, Q60_SQL, "metadata-only media profile (no payload read)"
    ),
    "q61_media_features": Query(
        q61_media_features, Q61_SQL, "mapInPandas Arrow-batched decode features"
    ),
    "q62_frame_sample": Query(
        q62_frame_sample, Q62_SQL, "binary frame sampling via substring-on-binary"
    ),
}


# --- q63: resize planning (aspect fit + thumbnail signature) --------------

RESIZE_MAX_W = 64
RESIZE_MAX_H = 64
_THUMB_SAMPLES = 16


def q63_media_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Integer aspect-ratio fit into a 64x64 box + stride-sampled
    thumbnail signature over visual media (multimodal.py::resize_plan).
    All target-dimension math is exact integer cross-multiply — no float
    ratio can round a dimension differently across engines."""
    from anti_ddos_spark.multimodal import resize_plan

    media = media_from_documents(t(spark, sf, "documents"))
    return resize_plan(
        media, RESIZE_MAX_W, RESIZE_MAX_H, thumb_samples=_THUMB_SAMPLES
    )


def _q63_sql() -> str:
    w = "CAST(n_chars % 640 + 16 AS BIGINT)"
    h = "CAST(n_chars % 480 + 16 AS BIGINT)"
    need = f"({w} > {RESIZE_MAX_W} OR {h} > {RESIZE_MAX_H})"
    hb = f"({w} * {RESIZE_MAX_H} <= {h} * {RESIZE_MAX_W})"
    new_h = (
        f"CASE WHEN NOT {need} THEN {h} WHEN {hb} THEN {RESIZE_MAX_H} "
        f"ELSE CAST(floor({h} * {RESIZE_MAX_W} / {w}) AS BIGINT) END"
    )
    new_w = (
        f"CASE WHEN NOT {need} THEN {w} WHEN {hb} "
        f"THEN CAST(floor({w} * {RESIZE_MAX_H} / {h}) AS BIGINT) "
        f"ELSE {RESIZE_MAX_W} END"
    )
    thumb = " || ".join(
        f"substr(text, CAST(floor({i} * octet_length(encode(text)) / "
        f"{_THUMB_SAMPLES}) AS INT) + 1, 1)"
        for i in range(_THUMB_SAMPLES)
    )
    return f"""
SELECT doc_id AS media_id, {_MT_SQL} AS media_type,
       CAST({w} AS INT) AS width, CAST({h} AS INT) AS height,
       CAST({new_w} AS INT) AS new_w, CAST({new_h} AS INT) AS new_h,
       md5({thumb}) AS thumb_digest
FROM documents
WHERE {_MT_SQL} IN ('image', 'video')
"""


EXTRA_QUERIES: dict[str, Query] = {
    "q63_media_resize": Query(
        q63_media_resize,
        _q63_sql(),
        "resize planning: integer aspect fit + stride thumbnail signature",
    ),
}

# Round-8 rotation (r7 verdict task #2): q61/q62 — the mapInPandas
# Arrow decode and binary frame sampling are plan-pinned in
# tests/test_multimodal.py and stable since round 2; q60 keeps the
# media family's driver presence. Their slots go to the round-7
# lifecycle family (see queries/core.py). Both keep full DuckDB hash
# oracles via full_registry().
for _name in ("q61_media_features", "q62_frame_sample"):
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
