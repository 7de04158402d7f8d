"""Multimodal operator plumbing tests (stubbed decode, real Spark shapes)."""

from __future__ import annotations

import pytest

from docling_core_spark.operators.multimodal import (
    image_features,
    image_metadata,
    sample_video_frames,
    set_decoders,
    synthetic_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media_df(spark, n=50).cache()
    df.count()
    yield df
    df.unpersist()


def test_image_metadata_shapes(spark, media):
    meta = image_metadata(media)
    rows = meta.collect()
    assert len(rows) == 50
    assert all(r["error"] is None for r in rows)
    assert all(64 <= r["width"] <= 2047 for r in rows)
    assert all(len(r["sha256"]) == 64 for r in rows)
    # deterministic: same input -> same metadata
    again = {r["media_id"]: (r["width"], r["height"]) for r in image_metadata(media).collect()}
    assert {r["media_id"]: (r["width"], r["height"]) for r in rows} == again


def test_image_features_dim(spark, media):
    feats = image_features(media, dim=16).collect()
    assert all(len(r["embedding"]) == 16 for r in feats)
    assert all(all(-1.0 <= v <= 1.0 for v in r["embedding"]) for r in feats)


def test_video_frame_sampling_bounded(spark, media):
    frames = sample_video_frames(media, max_frames=4)
    rows = frames.collect()
    per_media: dict = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    assert all(len(v) <= 4 for v in per_media.values())
    for v in per_media.values():
        idxs = [r["frame_idx"] for r in v]
        assert idxs == sorted(idxs)
        assert all(len(bytes(r["frame"])) == 32 for r in v)


def test_decoder_swap(spark, media):
    """Any real decoder drops in through set_decoders."""
    calls = {"n": 0}

    def fake(data: bytes) -> dict:
        calls["n"] += 1
        return {"width": 1, "height": 1, "format": "raw", "n_channels": 1}

    from docling_core_spark.operators import multimodal

    orig = dict(multimodal._DECODERS)
    try:
        set_decoders(image_decode=fake)
        out = image_metadata(media.limit(3)).collect()
        assert all(r["width"] == 1 and r["format"] == "raw" for r in out)
    finally:
        multimodal._DECODERS.update(orig)


def test_empty_payload_isolated(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("m0", None), ("m1", b"x")], "media_id string, data binary")
    rows = {r["media_id"]: r for r in image_metadata(df).collect()}
    assert rows["m0"]["error"] is not None  # empty payload -> per-row error
    assert rows["m1"]["error"] is None
