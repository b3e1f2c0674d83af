"""Deterministic media fixture table: the multimodal analogue of
``sources.pages`` — real encoded PNG/JPEG payloads with planted
near-duplicate pairs, reproducible bit-for-bit from a seed.

Used by the driver-contract media queries (pinned-fixture oracle shape:
the decoded features are a pure deterministic function of the payload
bytes, which are a pure function of the seed) and by pytest, which
cross-validates the features against the SOURCE pixel arrays (for PNG
the codec is lossless, so channel means/phash must match the source
exactly — a check that is independent of the decoder implementation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from bloom_filters_spark.functions.jpeg import (
    encode_jpeg,
    encode_jpeg_progressive,
)
from bloom_filters_spark.functions.multimodal import encode_png

MEDIA_TABLE_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int"
)


def _source_arrays(n: int, seed: int, size: int):
    """Yield (media_id, pixel array, mime): even ids are originals, odd
    ids near-copies of ``id-1`` (a handful of perturbed pixels —
    phash-close but not byte-identical).  Every third row will encode
    as JPEG (alternating baseline / progressive), the rest as PNG."""
    for i in range(n):
        rng = np.random.default_rng(seed + (i // 2))
        yy, xx = np.mgrid[0:size, 0:size]
        base = np.stack([
            (xx * rng.integers(2, 9) + yy * rng.integers(1, 5)) % 256,
            (128 + 110 * np.sin(xx / rng.uniform(4, 12))) % 256,
            rng.integers(0, 256, (size, size)),
        ], axis=-1).astype(np.uint8)
        # low-pass the noise channel so JPEG stays faithful
        base[:, :, 2] = (
            base[:, :, 2].astype(np.int32) // 4 * 4
        ).astype(np.uint8)
        img = base
        if i % 2 == 1:  # near-copy: perturb a few pixels
            img = base.copy()
            pert = np.random.default_rng(seed * 7 + i)
            for _ in range(6):
                y, x = pert.integers(0, size, 2)
                img[y, x] = pert.integers(0, 256, 3)
        yield i, img, ("image/jpeg" if i % 3 == 2 else "image/png")


def generate_media_pdf(n: int = 48, seed: int = 13,
                       size: int = 32) -> pd.DataFrame:
    rows = []
    for i, img, mime in _source_arrays(n, seed, size):
        if mime == "image/jpeg":
            # every other JPEG row is a progressive (SOF2) stream —
            # same quality, so it carries the IDENTICAL quantized
            # coefficients as the baseline stream would and decodes to
            # the same pixels; only the payload bytes differ.  Keeps
            # the web-corpus reality (~6-10% progressive) in the
            # driver-oracled path, not just in unit tests.
            enc = encode_jpeg_progressive if i % 6 == 5 else encode_jpeg
            payload = enc(img, quality=92)
        else:
            payload = encode_png(img)
        rows.append({
            "media_id": i,
            "kind": "image",
            "mime": mime,
            "payload": payload,
            "width": size,
            "height": size,
        })
    return pd.DataFrame(rows)


def media_table(spark: SparkSession, n: int = 48, seed: int = 13,
                size: int = 32) -> DataFrame:
    return spark.createDataFrame(generate_media_pdf(n, seed, size),
                                 MEDIA_TABLE_SCHEMA)


def source_images(n: int = 48, seed: int = 13, size: int = 32):
    """The PRE-ENCODE pixel arrays, keyed by media_id — the independent
    ground truth pytest validates decoded features against (never goes
    through the decoders)."""
    return {i: img for i, img, _ in _source_arrays(n, seed, size)}


# ---------------------------------------------------------------------------
# video fixture (MJPEG-in-AVI)
# ---------------------------------------------------------------------------

VIDEO_TABLE_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, duration_ms int"
)


def _video_source_frames(n: int, seed: int, size: int, n_frames: int):
    """Yield (media_id, [frame arrays]): even ids originals, odd ids
    near-copies of ``id-1`` (every frame perturbed in a few pixels —
    phash-close, not byte-identical).  Frames are smooth moving
    gradients so the JPEG roundtrip stays faithful."""
    for i in range(n):
        rng = np.random.default_rng(seed + (i // 2))
        fx, fy = int(rng.integers(2, 7)), int(rng.integers(1, 5))
        phase = float(rng.uniform(0, 50))
        frames = []
        for t in range(n_frames):
            yy, xx = np.mgrid[0:size, 0:size]
            img = np.stack([
                (xx * fx + yy * fy + t * 16) % 256,
                (128 + 110 * np.sin((xx + t * 3 + phase) / 7)) % 256,
                (yy * fx + t * 8) % 256,
            ], axis=-1).astype(np.uint8)
            if i % 2 == 1:
                pert = np.random.default_rng(seed * 31 + i * 101 + t)
                for _ in range(4):
                    y, x = pert.integers(0, size, 2)
                    img[y, x] = pert.integers(0, 256, 3)
            frames.append(img)
        yield i, frames


def generate_video_pdf(n: int = 12, seed: int = 29, size: int = 32,
                       n_frames: int = 8, fps: int = 4) -> pd.DataFrame:
    from bloom_filters_spark.functions.avi import encode_avi_mjpeg

    rows = []
    for i, frames in _video_source_frames(n, seed, size, n_frames):
        rows.append({
            "media_id": i,
            "kind": "video",
            "mime": "video/x-msvideo",
            "payload": encode_avi_mjpeg(frames, fps=fps, quality=92),
            "width": size,
            "height": size,
            "duration_ms": n_frames * 1000 // fps,
        })
    return pd.DataFrame(rows)


def video_table(spark: SparkSession, n: int = 12, seed: int = 29,
                size: int = 32, n_frames: int = 8,
                fps: int = 4) -> DataFrame:
    """Deterministic MJPEG-AVI fixture — same pinned-oracle contract as
    ``media_table``: payload bytes are a pure function of the seed."""
    return spark.createDataFrame(
        generate_video_pdf(n, seed, size, n_frames, fps),
        VIDEO_TABLE_SCHEMA,
    )


def source_video_frames(n: int = 12, seed: int = 29, size: int = 32,
                        n_frames: int = 8):
    """PRE-ENCODE frame arrays keyed by media_id — the decoder-
    independent ground truth for pytest."""
    return dict(_video_source_frames(n, seed, size, n_frames))
