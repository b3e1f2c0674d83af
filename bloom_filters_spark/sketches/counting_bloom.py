"""Counting Bloom filter — deletable membership, sum-mergeable counters.

Semantics match the reference ``CountingBloomFilter``
(``/root/reference/src/bloom/counting-bloom-filter.ts``): per-cell
``[bit, counter]`` pairs; ``add`` increments counters and sets bits,
``remove`` decrements and clears bits at <= 0 with NO underflow guard
(removing a non-member corrupts neighbors — faithful), ``rate`` uses the
standard ``(1 - e^(-k*n/m))^k`` with n = net insert count
(``counting-bloom-filter.ts:191-196``).

merge = elementwise counter sum + bit recompute (counter > 0).
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import (
    DEFAULT_SEED,
    get_indexes_batch,
    get_indexes_u64,
)
from bloom_filters_spark.sketches.base import (
    SketchBase,
    export_bigint,
    import_bigint,
    optimal_filter_size,
    optimal_hashes,
)


class CountingBloomFilter(SketchBase):
    def __init__(self, size: int, nb_hashes: int, seed: int = DEFAULT_SEED):
        if nb_hashes < 1:
            raise ValueError("A CountingBloomFilter needs at least one hash function")
        super().__init__(seed)
        self.size = size
        self.nb_hashes = nb_hashes
        self.bits = np.zeros(size, dtype=np.int8)
        self.counters = np.zeros(size, dtype=np.int64)
        self.length = 0

    @classmethod
    def create(cls, capacity: int, error_rate: float, seed: int = DEFAULT_SEED):
        m = optimal_filter_size(capacity, error_rate)
        k = optimal_hashes(m, capacity)
        return cls(m, k, seed)

    @classmethod
    def from_items(cls, items, error_rate: float, seed: int = DEFAULT_SEED):
        items = list(items)
        f = cls.create(len(items), error_rate, seed)
        f.add_batch(items)
        return f

    def _indexes(self, elements) -> np.ndarray:
        if isinstance(elements, np.ndarray) and elements.dtype in (
            np.dtype(np.uint64),
            np.dtype(np.int64),
        ):
            return get_indexes_u64(
                elements.astype(np.uint64), self.size, self.nb_hashes, self.seed
            )
        return get_indexes_batch(elements, self.size, self.nb_hashes, self.seed)

    def add(self, element):
        self.add_batch([element])

    def add_batch(self, elements):
        if len(elements) == 0:
            return
        idx = self._indexes(elements).ravel()
        # bincount beats np.add.at's random scatter (buffered C loop)
        self.counters += np.bincount(idx, minlength=self.size)
        self.bits[idx] = 1
        self.length += len(elements)

    def remove(self, element) -> bool:
        idx = self._indexes([element]).ravel()
        np.add.at(self.counters, idx, -1)
        # clear bit where counter <= 0 — faithful: no underflow guard
        self.bits[idx] = np.where(self.counters[idx] <= 0, 0, self.bits[idx])
        self.length -= 1
        return True

    def remove_batch(self, elements):
        """Batched remove — same end state as per-element ``remove``:
        counters only decrease during a removal batch, so "counter <= 0
        at any intermediate step" and "counter <= 0 at the end" clear
        the same bits."""
        if len(elements) == 0:
            return
        idx = self._indexes(elements).ravel()
        self.counters -= np.bincount(idx, minlength=self.size)
        touched = np.unique(idx)
        self.bits[touched] = np.where(
            self.counters[touched] <= 0, 0, self.bits[touched]
        ).astype(np.int8)
        self.length -= len(elements)

    def has(self, element) -> bool:
        return bool(self.has_batch([element])[0])

    def has_batch(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indexes(elements)
        return (self.bits[idx] != 0).all(axis=1)

    def rate(self) -> float:
        return (
            1 - math.exp(-self.nb_hashes * self.length / self.size)
        ) ** self.nb_hashes

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if self.size != other.size or self.nb_hashes != other.nb_hashes:
            raise ValueError("cannot merge counting Bloom filters with different configs")
        out = CountingBloomFilter(self.size, self.nb_hashes, self.seed)
        out.counters = self.counters + other.counters
        out.bits = (out.counters > 0).astype(np.int8)
        out.length = self.length + other.length
        return out

    def equals(self, other: "CountingBloomFilter") -> bool:
        return (
            self.size == other.size
            and self.nb_hashes == other.nb_hashes
            and np.array_equal(self.counters, other.counters)
        )

    def to_json_obj(self) -> dict:
        return {
            "_seed": export_bigint(self.seed),
            "_size": self.size,
            "_nbHashes": self.nb_hashes,
            "_filter": [
                [int(b), int(c)] for b, c in zip(self.bits.tolist(), self.counters.tolist())
            ],
            "_length": self.length,
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "CountingBloomFilter":
        f = cls(obj["_size"], obj["_nbHashes"], import_bigint(obj["_seed"]))
        arr = np.array(obj["_filter"], dtype=np.int64)
        f.bits = arr[:, 0].astype(np.int8)
        f.counters = arr[:, 1]
        f.length = obj["_length"]
        return f
