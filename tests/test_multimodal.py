"""Multimodal plumbing: fake-codec decode/resize/frame-sample via mapInPandas."""

from __future__ import annotations

import pytest

from connemara_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    encode_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(10):
        body = bytes([(i * 7 + j) % 256 for j in range(100 + i)])
        payload = encode_fake_media(i, "image", 640 + i, 480, 0, body)
        rows.append((i, "image", payload, ("image/fake", 640 + i, 480, None)))
    rows.append((100, "video", encode_fake_media(100, "video", 1920, 1080, 5500, b"vv"), ("video/fake", 1920, 1080, 5500)))
    rows.append((101, "image", b"GARBAGE-not-decodable", ("image/fake", 0, 0, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_requires_explicit_fake(media):
    with pytest.raises(NotImplementedError):
        decode_images(media)


def test_fake_decode_features(media):
    out = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    assert 101 not in out  # undecodable dropped
    assert out[0]["width"] == 640 and out[0]["height"] == 480
    assert out[9]["width"] == 649
    assert out[0]["n_bytes"] == 16 + 100
    assert 0 <= out[0]["mean_byte"] <= 255


def test_fake_resize_rewrites_header(media):
    resized = resize_images(media, width=32, height=32, fake=True)
    feats = {r["media_id"]: r for r in decode_images(resized, fake=True).collect()}
    assert all(r["width"] == 32 and r["height"] == 32 for r in feats.values())
    # payload body preserved
    orig = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    assert feats[3]["checksum"] == orig[3]["checksum"]


def test_frame_sampling(media):
    frames = sample_frames(media, every_ms=1000, fake=True).collect()
    assert {r["frame_ms"] for r in frames} == {0, 1000, 2000, 3000, 4000, 5000}
    assert all(r["media_id"] == 100 for r in frames)
