"""Shared helpers for sketch serialization.

The reference wraps bigints as ``{"$bf$bigint": "<decimal>"}``
(``/root/reference/src/utils.ts:101-114``) and bitsets as base64
(``/root/reference/src/bloom/bit-set.ts:94-116``).
"""

from __future__ import annotations

import base64
import json
import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED


def export_bigint(value: int) -> dict:
    return {"$bf$bigint": str(value)}


def import_bigint(value) -> int:
    if isinstance(value, dict):
        return int(value["$bf$bigint"])
    return int(value)


def encode_bytes(arr: np.ndarray) -> str:
    return base64.b64encode(arr.tobytes()).decode("ascii")


def decode_bytes(content: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(content), dtype=np.uint8).copy()


def optimal_filter_size(length: int, error_rate: float) -> int:
    """m = ceil(-n ln eps / ln^2 2) — reference src/formulas.ts:38-41."""
    return math.ceil(-(length * math.log(error_rate)) / math.log(2) ** 2)


def optimal_hashes(size: int, length: int) -> int:
    """k = ceil((m/n) ln 2) — reference src/formulas.ts:49-51."""
    return math.ceil((size / length) * math.log(2))


class SketchBase:
    """Common JSON plumbing: each subclass defines ``_export``/``_import``."""

    def __init__(self, seed: int = DEFAULT_SEED):
        self.seed = seed

    def save_as_json(self) -> str:
        return json.dumps(self.to_json_obj(), separators=(",", ":"))

    @classmethod
    def from_json(cls, payload):
        if isinstance(payload, (str, bytes)):
            payload = json.loads(payload)
        return cls.from_json_obj(payload)

    def to_bytes(self) -> bytes:
        return self.save_as_json().encode("utf-8")

    @classmethod
    def from_bytes(cls, data: bytes):
        return cls.from_json(data.decode("utf-8"))
