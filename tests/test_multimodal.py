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


def test_decode_media_real_is_stubbed(spark, media):
    out = decode_media(media.limit(1), impl="real")
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        out.collect()


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
