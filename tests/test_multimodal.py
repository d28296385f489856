"""Multimodal plumbing tests: binary+meta schema, Arrow batch decode,
row-expanding frame sampling, partition-invariance, parquet round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import multimodal as M


def test_decode_features_schema_and_determinism(spark):
    media = M.make_mock_media(spark, 12)
    out = M.decode_features(media)
    assert out.schema == M.DECODE_SCHEMA
    a = sorted((r.media_id, r.features) for r in out.collect())
    b = sorted(
        (r.media_id, r.features)
        for r in M.decode_features(media.repartition(7)).collect()
    )
    assert a == b  # partitioning must not change results
    assert all(len(f) == M.FEATURE_DIM for _, f in a)


def test_decode_strict_surfaces_stub(spark):
    media = M.make_mock_media(spark, 1)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        M.decode_features(media, strict=True).collect()


def test_resize_updates_meta_and_length(spark):
    media = M.make_mock_media(spark, 5)
    out = M.resize_media(media, 32, 32).collect()
    assert all(r.meta.width == 32 and r.meta.height == 32 for r in out)
    lengths = {len(bytes(r.content)) for r in out}
    assert len(lengths) == 1  # schema-stable resized payload


def test_sample_frames_multiplicity(spark):
    media = M.make_mock_media(spark, 4, kind="video")
    frames = M.sample_frames(media, every_ms=250)
    got = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    want = {
        r.media_id: -(-r.meta.duration_ms // 250)
        for r in media.select("media_id", "meta").collect()
    }
    assert got == want
    one = frames.filter((F.col("media_id") == 0) & (F.col("frame_idx") == 0)).first()
    assert one.ts_ms == 0 and len(bytes(one.frame)) == 16


def test_media_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "media")
    media = M.make_mock_media(spark, 6)
    media.write.parquet(out)
    back = spark.read.parquet(out)
    # parquet round-trip relaxes nullability; names+types must survive
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    orig = {r.media_id: bytes(r.content) for r in media.collect()}
    rt = {r.media_id: bytes(r.content) for r in back.collect()}
    assert orig == rt
