"""Multimodal (image/audio/video) column support.

Not present in the reference (it is packets-only); this is the
training-data-pipeline extension surface: media as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

Design for 100 TB:
- content stays an opaque ``BinaryType`` column — parquet stores it
  page-compressed, column pruning means metadata-only queries never read
  the bytes at all;
- decode/feature-extract runs in ``mapInPandas`` so each Python worker
  sees Arrow record batches (vectorized, zero-copy), never row-at-a-time
  pickling. The stage is narrow (no shuffle): it scales linearly with
  partitions;
- real codec work (PIL/ffmpeg/librosa) is STUBBED in this environment —
  ``decode_media(..., impl="real")`` raises NotImplementedError at the
  decode callsite, while ``impl="fake"`` produces a deterministic,
  SQL-checkable feature tuple exercising the identical plumbing
  (schema, batching, partitioning, UDF signature).

The fake decode is fully deterministic from the bytes, so the DuckDB
oracle can recompute it and the driver hash-check covers the whole
mapInPandas path end to end.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType(), False),  # payload size, set at ingest
                    T.StructField("width", T.IntegerType(), True),   # image/video
                    T.StructField("height", T.IntegerType(), True),  # image/video
                    T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("first_byte", T.IntegerType(), False),
        T.StructField("digest8", T.StringType(), False),  # first 8 hex of md5
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents`: the utf-8
    bytes of `text` play the role of an opaque media payload, with typed
    metadata synthesized from doc attributes. This is the test harness
    for the binary-column plumbing; a real corpus would `spark.read`
    parquet with a true binary column of identical shape."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    visual = mt.isin("image", "video")
    timed = mt.isin("audio", "video")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            # documents are ASCII so n_chars == byte length; a real ingest
            # would stamp octet_length(content) here
            F.col("n_chars").cast("int").alias("n_bytes"),
            F.when(visual, (F.col("n_chars") % 640 + 16).cast("int")).alias("width"),
            F.when(visual, (F.col("n_chars") % 480 + 16).cast("int")).alias("height"),
            F.when(timed, (F.col("n_chars") * 10).cast("int")).alias("duration_ms"),
            F.when(mt == "image", F.lit("png"))
            .when(mt == "audio", F.lit("pcm16"))
            .otherwise(F.lit("h264"))
            .alias("codec"),
        ).alias("meta"),
    )


def _decode_real(content: bytes, media_type: str):  # pragma: no cover
    """Real codec hook. The container ships no PIL/ffmpeg/librosa, so
    this is an explicit stub: the Spark-side plumbing around it (Arrow
    batches, schema, partitioning) is real and tested via impl='fake'."""
    raise NotImplementedError(
        f"real {media_type} decode requires codec libraries not present "
        "in this environment; use impl='fake' for the deterministic test path"
    )


def decode_media(media: DataFrame, impl: str = "fake") -> DataFrame:
    """Arrow-batched decode / feature extraction over binary content.

    impl='fake': deterministic features (length, first byte, md5 prefix)
    computed per Arrow batch in pandas — same signature, batch shape and
    schema contract as a real decoder.
    """
    if impl not in ("fake", "real"):
        raise ValueError(f"impl must be 'fake' or 'real', got {impl!r}")

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if impl == "real":
                pdf.apply(
                    lambda r: _decode_real(r["content"], r["media_type"]), axis=1
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.str.len().astype("int32"),
                    "first_byte": content.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "digest8": content.map(
                        lambda b: hashlib.md5(b).hexdigest()[:8]
                    ),
                }
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        extract, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Deterministic frame sampling for video rows: slice `n_frames`
    evenly-spaced byte windows out of the payload — pure Catalyst
    (substring on binary), no Python. Real frame extraction would swap
    the slice for a decoder call; the partitioning/explode shape stays."""
    vids = media.filter(F.col("media_type") == "video")
    total = F.octet_length("content")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_no")
    vids = vids.select("media_id", total.alias("n_bytes"), F.col("content"), idx)
    # evenly spaced offsets: floor(frame_no * n_bytes / n_frames)
    off = F.floor(F.col("frame_no") * F.col("n_bytes") / n_frames).cast("int")
    return vids.select(
        "media_id",
        "frame_no",
        F.substring(F.col("content"), off + 1, frame_bytes).alias("frame"),
    )
