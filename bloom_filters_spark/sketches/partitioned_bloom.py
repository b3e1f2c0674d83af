"""Partitioned (k-slice) Bloom filter.

Semantics match the reference ``PartitionedBloomFilter``
(``/root/reference/src/bloom/partitioned-bloom-filter.ts:46-189``):
k slices of ``m = ceil(bits/k)`` bits; hash i addresses slice i;
``create`` uses ``k = max(ceil(log2(1/eps)), 2)`` and
``M = n*|ln eps| / ln^2 2``; ``load`` = totalSetBits/bits and
``rate`` = load^k.  merge = bitwise OR per slice.
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
    decode_bytes,
    encode_bytes,
    export_bigint,
    import_bigint,
)

_BIT_MASKS = np.left_shift(np.uint8(1), np.arange(8, dtype=np.uint8))


class PartitionedBloomFilter(SketchBase):
    def __init__(self, bits: float, nb_hashes: int, error_rate: float,
                 seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.bits = bits
        self.k = nb_hashes
        self.error_rate = error_rate
        self.m = math.ceil(bits / nb_hashes)  # slice size in bit cells
        # (k, ceil(m/8)) byte matrix; LSB-first bit order per slice
        self.filter = np.zeros((self.k, math.ceil(self.m / 8)), dtype=np.uint8)

    @classmethod
    def create(cls, size: int, error_rate: float, nb_hashes: int | None = None,
               seed: int = DEFAULT_SEED):
        L = max(nb_hashes if nb_hashes else math.ceil(math.log2(1 / error_rate)), 2)
        M = (size * abs(math.log(error_rate))) / (math.log(2) ** 2)
        return cls(M, L, error_rate, seed)

    @classmethod
    def from_items(cls, items, error_rate: float, seed: int = DEFAULT_SEED):
        items = list(items)
        f = cls.create(len(items), error_rate, seed=seed)
        f.add_batch(items)
        return f

    @property
    def capacity(self) -> int:
        return math.floor(
            (self.k * self.m * math.log(2) ** 2) / abs(math.log(self.error_rate))
        )

    def _indexes(self, elements) -> np.ndarray:
        if isinstance(elements, np.ndarray) and elements.dtype in (
            np.dtype(np.uint64),
            np.dtype(np.int64),
        ):
            return get_indexes_u64(
                elements.astype(np.uint64), self.m, self.k, self.seed
            )
        return get_indexes_batch(elements, self.m, self.k, self.seed)

    def add(self, element):
        self.add_batch([element])

    def add_batch(self, elements):
        if len(elements) == 0:
            return
        idx = self._indexes(elements)  # (n, k): index i goes to slice i
        rows = np.broadcast_to(np.arange(self.k), idx.shape)
        np.bitwise_or.at(
            self.filter, (rows.ravel(), idx.ravel() >> 3), _BIT_MASKS[idx.ravel() & 7]
        )

    def has(self, element) -> bool:
        return bool(self.has_batch([element])[0])

    def has_batch(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indexes(elements)
        rows = np.broadcast_to(np.arange(self.k), idx.shape)
        probed = (self.filter[rows, idx >> 3] & _BIT_MASKS[idx & 7]) != 0
        return probed.all(axis=1)

    def load(self) -> float:
        return float(np.unpackbits(self.filter).sum()) / self.bits

    def rate(self) -> float:
        return self.load() ** self.k

    def merge(self, other: "PartitionedBloomFilter") -> "PartitionedBloomFilter":
        if self.m != other.m or self.k != other.k:
            raise ValueError("cannot merge partitioned Bloom filters with different configs")
        out = PartitionedBloomFilter(self.bits, self.k, self.error_rate, self.seed)
        out.filter = np.bitwise_or(self.filter, other.filter)
        return out

    def equals(self, other: "PartitionedBloomFilter") -> bool:
        return (
            self.m == other.m
            and self.k == other.k
            and np.array_equal(self.filter, other.filter)
        )

    def to_json_obj(self) -> dict:
        return {
            "_bits": self.bits,
            "_k": self.k,
            "_filter": [
                {"size": self.filter.shape[1] * 8, "content": encode_bytes(row)}
                for row in self.filter
            ],
            "_seed": export_bigint(self.seed),
            "_m": self.m,
            "_errorRate": self.error_rate,
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "PartitionedBloomFilter":
        f = cls(obj["_bits"], obj["_k"], obj["_errorRate"], import_bigint(obj["_seed"]))
        f.m = obj["_m"]
        f.filter = np.stack([decode_bytes(b["content"]) for b in obj["_filter"]])
        return f
