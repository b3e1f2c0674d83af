"""Multimodal plumbing tests: binary payload columns through
mapInPandas with the deterministic fake decoder (real decoders are
stubbed — not in this container)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_image_features,
    media_repartition,
    near_dup_images,
    sample_video_frames,
)


@pytest.fixture()
def media_df(spark):
    rng = np.random.default_rng(13)
    rows = []
    for i in range(40):
        payload = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        rows.append((i, "image", bytearray(payload), "image/fake", 32, 32, None))
    # plant a byte-identical duplicate payload (rows 40 ~ row 0)
    rows.append((40, "image", bytearray(rows[0][2]), "image/fake", 32, 32, None))
    # a couple of "videos"
    for i in (50, 51):
        payload = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
        rows.append((i, "video", bytearray(payload), "video/fake", None, None, 3000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_extract_image_features(spark, media_df):
    feats = extract_image_features(
        media_df.filter(F.col("kind") == "image"), fake_decode=True
    )
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 41
    assert rows[0]["width"] == 32 and rows[0]["height"] == 32
    assert len(rows[0]["channel_means"]) == 3
    # identical payloads → identical features
    assert rows[0]["phash"] == rows[40]["phash"]
    assert rows[0]["channel_means"] == rows[40]["channel_means"]
    # deterministic across runs
    again = {r["media_id"]: r["phash"] for r in feats.collect()}
    assert again == {k: v["phash"] for k, v in rows.items()}


def test_near_dup_images_finds_planted_pair(spark, media_df):
    feats = extract_image_features(
        media_df.filter(F.col("kind") == "image"), fake_decode=True
    )
    pairs = {(r["id1"], r["id2"]) for r in near_dup_images(feats, 0).collect()}
    assert (0, 40) in pairs


def test_video_frame_sampling(spark, media_df):
    frames = sample_video_frames(
        media_df.filter(F.col("kind") == "video"), every_ms=1000, fake_decode=True
    )
    rows = frames.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_media) == [50, 51]
    assert sorted(by_media[50]) == [0, 1, 2]  # 3000ms / 1000ms


def test_media_repartition_sizes(spark, media_df):
    out = media_repartition(media_df, target_bytes_per_partition=50_000)
    # ~4KB * 43 rows = ~190KB → ceil(190/50)+... at least 3 partitions
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == media_df.count()
