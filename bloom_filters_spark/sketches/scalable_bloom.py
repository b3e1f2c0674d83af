"""Scalable Bloom filter — growing stack of partitioned Bloom filters.

Semantics match the reference ``ScalableBloomFilter``
(``/root/reference/src/bloom/scalable-bloom-filter.ts:30-160``):

* growth trigger: when ``current.load() >= 0.5`` push a new partitioned
  filter (``scalable-bloom-filter.ts:133-140``),
* level i sizing (faithful quirk: "size" is seeded from the FIRST
  filter's slice size ``_m``): ``size_i = m0 * 2**i``,
  ``eps_i = eps_{i-1} * ratio`` (ratio default 0.8),
  ``k_i = ceil(k0 + i*log2(1/ratio))`` (``scalable-bloom-filter.ts:107-126``),
* ``has`` = OR over all sub-filters.

In batch dedup we prefer pre-sizing from an HLL estimate; this structure
exists for streaming/unbounded inserts and reference parity.
"""

from __future__ import annotations

import math

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint
from bloom_filters_spark.sketches.partitioned_bloom import PartitionedBloomFilter

import numpy as np


class ScalableBloomFilter(SketchBase):
    S = 2
    DEFAULT_RATIO = 0.8

    def __init__(self, initial_size: int = 128, initial_error_rate: float = 0.001,
                 ratio: float = DEFAULT_RATIO, seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.initial_size = initial_size
        self.initial_error_rate = initial_error_rate
        self.ratio = ratio
        self.filters: list[PartitionedBloomFilter] = []
        self._add_filter()

    @property
    def current(self) -> PartitionedBloomFilter:
        return self.filters[-1]

    def _add_filter(self):
        index = len(self.filters)
        if index == 0:
            new_size = self.initial_size
            new_error = self.initial_error_rate
            new_hashes = None
        else:
            new_size = self.filters[0].m * (self.S**index)
            new_error = self.current.error_rate * self.ratio
            new_hashes = math.ceil(
                self.filters[0].k + index * math.log2(1 / self.ratio)
            )
        self.filters.append(
            PartitionedBloomFilter.create(new_size, new_error, new_hashes, self.seed)
        )

    def add(self, element):
        if self.current.load() >= 0.5:
            self._add_filter()
        self.current.add(element)

    def add_batch(self, elements):
        # chunked bulk add: check the growth trigger between chunks so the
        # load stays near the reference's one-at-a-time trajectory
        chunk = 256
        if not isinstance(elements, np.ndarray):
            elements = list(elements)  # ndarray chunks slice natively
        for i in range(0, len(elements), chunk):
            if self.current.load() >= 0.5:
                self._add_filter()
            self.current.add_batch(elements[i : i + chunk])

    def has(self, element) -> bool:
        return any(f.has(element) for f in self.filters)

    def has_batch(self, elements) -> np.ndarray:
        out = np.zeros(len(elements), dtype=bool)
        for f in self.filters:
            out |= f.has_batch(elements)
        return out

    def capacity(self) -> int:
        return sum(f.capacity for f in self.filters)

    def rate(self) -> float:
        # compounded: 1 - prod(1 - rate_i)
        p = 1.0
        for f in self.filters:
            p *= 1 - f.rate()
        return 1 - p

    def to_json_obj(self) -> dict:
        return {
            "_initialSize": self.initial_size,
            "_initialErrorRate": self.initial_error_rate,
            "_ratio": self.ratio,
            "_filters": [f.to_json_obj() for f in self.filters],
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "ScalableBloomFilter":
        f = cls(
            obj["_initialSize"],
            obj["_initialErrorRate"],
            obj["_ratio"],
            import_bigint(obj["_seed"]),
        )
        f.filters = [PartitionedBloomFilter.from_json_obj(o) for o in obj["_filters"]]
        return f
