"""Multimodal binary-column pipeline: metadata, resize, features, frame
sampling — fake RAW8/VID8 codec, real Spark plumbing, numpy oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from mandoline_spark.functions.multimodal import (
    decode_image,
    decode_video,
    encode_image,
    encode_video,
    frame_sample,
    image_features,
    resize_images,
    with_blob_metadata,
)


def _images(n=8, seed=3):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        for h, w in rng.integers(4, 40, (n, 2))
    ]


@pytest.fixture(scope="module")
def image_df(spark):
    imgs = _images()
    pdf = pd.DataFrame(
        {"id": range(len(imgs)), "blob": [encode_image(i) for i in imgs]}
    )
    return spark.createDataFrame(pdf), imgs


def test_codec_roundtrip():
    for img in _images(4):
        np.testing.assert_array_equal(decode_image(encode_image(img)), img)
    vid = np.stack(_images(6, seed=4)[0:1] * 5)
    np.testing.assert_array_equal(decode_video(encode_video(vid)), vid)


def test_non_fake_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not a raw8 image")


def test_blob_metadata(image_df):
    df, imgs = image_df
    got = (
        with_blob_metadata(df, "blob", mime="image/raw8")
        .select("id", "meta.*")
        .orderBy("id")
        .collect()
    )
    for row, img in zip(got, imgs):
        blob = encode_image(img)
        assert row["nbytes"] == len(blob)
        assert row["fp"] == hashlib.md5(blob).hexdigest()
        assert row["mime"] == "image/raw8"


def test_resize_images(image_df):
    df, imgs = image_df
    got = resize_images(df, 8, 8).orderBy("id").collect()
    for row, img in zip(got, imgs):
        out = decode_image(bytes(row["blob"]))
        assert out.shape == (8, 8, 3)
        h, w, _ = img.shape
        yi = (np.arange(8) * h // 8).astype(int)
        xi = (np.arange(8) * w // 8).astype(int)
        np.testing.assert_array_equal(out, img[np.ix_(yi, xi)])


def test_image_features(image_df):
    df, imgs = image_df
    got = image_features(df).orderBy("id").collect()
    for row, img in zip(got, imgs):
        f = np.array(row["features"])
        assert f.shape == (12,)
        imgf = img.astype(np.float64)
        np.testing.assert_allclose(f[0::4], imgf.mean(axis=(0, 1)))
        np.testing.assert_allclose(f[1::4], imgf.std(axis=(0, 1)))


def test_frame_sample(spark):
    rng = np.random.default_rng(9)
    vids = [
        rng.integers(0, 256, (17, 6, 5, 3), dtype=np.uint8),
        rng.integers(0, 256, (4, 6, 5, 3), dtype=np.uint8),
    ]
    pdf = pd.DataFrame(
        {"id": [0, 1], "blob": [encode_video(v) for v in vids]}
    )
    df = spark.createDataFrame(pdf)
    got = frame_sample(df, every_n=5).orderBy("id", "frame_idx").collect()
    expect = [(0, 0), (0, 5), (0, 10), (0, 15), (1, 0)]
    assert [(r["id"], r["frame_idx"]) for r in got] == expect
    for r in got:
        np.testing.assert_array_equal(
            decode_image(bytes(r["frame"])), vids[r["id"]][r["frame_idx"]]
        )
