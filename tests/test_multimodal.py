"""Multimodal plumbing tests: binary columns, mapInPandas decode, pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_ddos_spark.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    frame_sample,
    media_from_documents,
)
from anti_ddos_spark.queries.base import t
from anti_ddos_spark.queries.media import q60_media_profile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(t(spark, SF, "documents")).cache()


def test_media_schema_and_types(media):
    assert dict(media.dtypes)["content"] == "binary"
    meta_fields = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_fields == ["n_bytes", "width", "height", "duration_ms", "codec"]
    # n_bytes metadata matches actual payload size (ASCII invariant)
    bad = media.filter(F.col("meta.n_bytes") != F.octet_length("content")).count()
    assert bad == 0


def test_metadata_query_prunes_payload(spark):
    """q60 must not read the payload column (scale-critical: at 100 TB the
    bytes dominate the table; metadata queries must scan metadata only).

    Uses a different sf dir than the cached `media` fixture — otherwise
    Spark's cache manager swaps the scan for the cached media plan (which
    materialized the payload) and ReadSchema no longer reflects pruning."""
    plan = (
        q60_media_profile(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("text" not in l for l in read_schema), read_schema


def test_decode_media_fake_features(media):
    feats = decode_media(media, impl="fake")
    assert feats.schema == FEATURE_SCHEMA
    joined = feats.join(media, "media_id")
    # n_bytes from python == octet_length from catalyst
    assert joined.filter(F.col("n_bytes") != F.octet_length("content")).count() == 0
    # digest8 == first 8 hex chars of catalyst md5 over the same bytes
    assert (
        joined.filter(F.col("digest8") != F.substring(F.md5("content"), 1, 8)).count()
        == 0
    )


# --- real container-header decode (round 5, VERDICT r4 #6) ----------------

def _tiny_png(w: int = 3, h: int = 2) -> bytes:
    """A COMPLETE valid PNG (sig + IHDR + IDAT + IEND, correct CRCs):
    w×h opaque gray 8-bit RGB."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x80\x80\x80" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(w: int = 7, h: int = 5) -> bytes:
    """Minimal JPEG header stream: SOI + APP0(JFIF) + SOF0 frame header."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
    )


def _tiny_wav(rate: int = 8000, channels: int = 1, bits: int = 16, n: int = 4000) -> bytes:
    import struct

    data = b"\x00" * (n * channels * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_media_header_pure():
    from anti_ddos_spark.multimodal import parse_media_header

    png = parse_media_header(_tiny_png(3, 2))
    assert (png["format"], png["width"], png["height"], png["bit_depth"]) == ("png", 3, 2, 8)
    jpg = parse_media_header(_tiny_jpeg(7, 5))
    assert (jpg["format"], jpg["width"], jpg["height"]) == ("jpeg", 7, 5)
    wav = parse_media_header(_tiny_wav(rate=8000, n=4000))
    assert (wav["format"], wav["sample_rate"], wav["channels"], wav["bit_depth"]) == ("wav", 8000, 1, 16)
    assert wav["duration_ms"] == 500  # 4000 frames @ 8 kHz
    gif = parse_media_header(b"GIF89a" + (9).to_bytes(2, "little") + (4).to_bytes(2, "little") + b"\x00" * 4)
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 9, 4)
    with pytest.raises(ValueError, match="unrecognized"):
        parse_media_header(b"plain text, no container")


def test_decode_media_real_parses_headers_in_arrow_path(spark):
    """impl='real' end-to-end through mapInPandas: real PNG/JPEG/WAV bytes
    in a binary column come back with parsed dimensions; a non-container
    payload yields null header fields (quarantine, not stage failure);
    the fake-path features (n_bytes/digest8) ride along unchanged."""
    from anti_ddos_spark.multimodal import REAL_FEATURE_SCHEMA

    rows = [
        (1, "image", bytearray(_tiny_png(3, 2))),
        (2, "image", bytearray(_tiny_jpeg(7, 5))),
        (3, "audio", bytearray(_tiny_wav())),
        (4, "image", bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(
        rows, "media_id LONG, media_type STRING, content BINARY"
    )
    out = decode_media(media, impl="real")
    assert out.schema == REAL_FEATURE_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 3, 2)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 7, 5)
    assert (got[3]["format"], got[3]["sample_rate"], got[3]["duration_ms"]) == ("wav", 8000, 500)
    assert got[4]["format"] is None and got[4]["width"] is None
    # the shared features still match the fake path's contract
    import hashlib

    assert got[1]["n_bytes"] == len(_tiny_png(3, 2))
    assert got[4]["digest8"] == hashlib.md5(b"not an image at all").hexdigest()[:8]


def test_decode_media_bad_impl(media):
    with pytest.raises(ValueError, match="impl"):
        decode_media(media, impl="bogus")


def test_frame_sample_shape(media):
    n_videos = media.filter(F.col("media_type") == "video").count()
    frames = frame_sample(media, n_frames=4, frame_bytes=32).cache()
    assert frames.count() == 4 * n_videos
    assert frames.groupBy("media_id").count().filter(F.col("count") != 4).count() == 0
    # every frame is a non-empty slice of at most frame_bytes
    sizes = frames.select(F.octet_length("frame").alias("n")).agg(
        F.min("n").alias("lo"), F.max("n").alias("hi")
    ).collect()[0]
    assert sizes["lo"] >= 1 and sizes["hi"] <= 32
