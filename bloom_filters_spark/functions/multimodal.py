"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual media decoding is
STUBBED (the image/audio libraries are not in this container):

* ``decode_image`` raises ``NotImplementedError`` unless
  ``fake_decode=True``, in which case it produces a deterministic fake
  decode (dimensions/features derived from the payload bytes) so the
  distributed plumbing can be exercised end-to-end.

At 100TB scale the pattern is: keep payloads in their own parquet/
Iceberg column chunk (never project them unless needed — column pruning
skips the bytes entirely), partition by size so a batch of payloads
fits executor memory (``media_repartition``), and run feature
extraction as one mapInPandas pass emitting small typed features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "channel_means array<double>, phash long"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_phash long"


def media_repartition(df: DataFrame, target_bytes_per_partition: int = 256 << 20,
                      size_col: str = "payload") -> DataFrame:
    """Partition media rows so each partition holds ~target bytes of
    payload — large-binary batches must fit executor memory (the Arrow
    batch is the unit of transfer to Python)."""
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.length(size_col)), F.lit(0)).alias("total"),
    ).collect()[0]
    if stats["n"] == 0:
        return df
    n_parts = max(1, int(stats["total"] / target_bytes_per_partition) + 1)
    return df.repartition(n_parts)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives a small
    pseudo-image from the payload bytes.  Pure function of the bytes."""
    arr = np.frombuffer(payload[:3072].ljust(3072, b"\0"), dtype=np.uint8)
    return arr.reshape(32, 32, 3)


def decode_image(payload: bytes, fake_decode: bool = False) -> np.ndarray:
    """STUB: real decoding needs Pillow/libvips (not in this container).

    The distributed call-site (schema, batching, partitioning) is real;
    swap this function's body for ``PIL.Image.open(io.BytesIO(payload))``
    when the dependency is available.
    """
    if not fake_decode:
        raise NotImplementedError(
            "image decoding requires Pillow/libvips, not available offline; "
            "pass fake_decode=True for the deterministic test double"
        )
    return _fake_decode(payload)


def _phash(img: np.ndarray) -> int:
    """Tiny perceptual-hash stand-in: sign bits of mean-centered 8x8
    grayscale blocks — deterministic, pure numpy."""
    gray = img.mean(axis=2)
    h, w = gray.shape
    blocks = gray[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(
        axis=(1, 3)
    )
    bits = (blocks > blocks.mean()).ravel()
    out = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def extract_image_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """media(media_id, payload, ...) → typed features via one
    mapInPandas pass (Arrow batches of binary payloads in, small typed
    rows out — payload bytes never come back to the JVM)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload), fake_decode=fake_decode)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_bytes": len(payload),
                        "channel_means": img.mean(axis=(0, 1)).tolist(),
                        "phash": _phash(img),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "width", "height", "n_bytes",
                         "channel_means", "phash"]
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        fake_decode: bool = False) -> DataFrame:
    """Frame sampling plumbing: one media row fans out to N frame rows.
    The decoder stub treats each ``every_ms`` slice of payload bytes as
    one 'frame'."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake_decode:
                    raise NotImplementedError(
                        "video decoding requires ffmpeg, not available offline"
                    )
                n_frames = max(int(duration or 0) // every_ms, 1)
                payload = bytes(payload)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    img = _fake_decode(payload[i * step : (i + 1) * step + 3072])
                    rows.append(
                        {"media_id": media_id, "frame_idx": i,
                         "frame_phash": _phash(img)}
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "frame_idx", "frame_phash"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        sample, FRAME_SAMPLE_SCHEMA
    )


def near_dup_images(features: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual-hash near-dup pairs over extracted features — the same
    4-block pigeonhole join as SimHash text dedup (operators/dedup.py)."""
    blocks = features.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("phash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                for b in range(4)
            ])
        ).alias("block_id", "block_val"),
    )
    a = blocks.select("block_id", "block_val",
                      F.col("media_id").alias("id1"), F.col("phash").alias("p1"))
    b = blocks.select("block_id", "block_val",
                      F.col("media_id").alias("id2"), F.col("phash").alias("p2"))
    hamming = F.bit_count(F.col("p1").bitwiseXOR(F.col("p2")))
    return (
        a.join(b, ["block_id", "block_val"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )
