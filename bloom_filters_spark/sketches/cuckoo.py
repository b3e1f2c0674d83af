"""Cuckoo filter — deletable membership with fingerprint buckets.

Semantics match the reference ``CuckooFilter``
(``/root/reference/src/cuckoo/cuckoo-filter.ts``):

* ``computeFingerpintLength = ceil(ceil(log2(1/eps) + log2(2*bucketSize)) / 8)``
  in hex chars (``cuckoo-filter.ts:33-36``),
* ``create(n, eps, b=4, kicks=500)`` → ``capacity = ceil(n/b/0.955)``
  buckets (``cuckoo-filter.ts:87-96``),
* ``_locations``: fingerprint = first fLength chars of
  ``hex(xxh64(e, seed))`` (no zero-padding — faithful), ``i1 = h mod size``,
  ``i2 = (h XOR xxh64(fp, seed)) mod size`` (``cuckoo-filter.ts:319-339``),
* ``add``: try i1 then i2, else up to maxKicks random swaps with a
  seeded PRNG, rolling back on failure (``cuckoo-filter.ts:176-237``).

Inherently sequential — used per-partition inside ``mapInPandas`` or
driver-side; the batch engine prefers Bloom/exact joins for pruning.
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED, xxh64, xxh64_u64
from bloom_filters_spark.seedrandom_rng import SeedRandom
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint

MASK64 = (1 << 64) - 1


def compute_fingerprint_length(bucket_size: int, error_rate: float) -> int:
    f = math.ceil(math.log2(1 / error_rate) + math.log2(2 * bucket_size))
    return math.ceil(f / 8)  # hex-char units, faithful quirk


class CuckooFilter(SketchBase):
    def __init__(self, size: int, f_length: int, bucket_size: int,
                 max_kicks: int = 500, seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.size = size
        self.f_length = f_length
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.buckets: list[list] = [[] for _ in range(size)]
        self.length = 0
        # reference: BaseFilter seeds `seedrandom(`${seed}`)` and draws
        # kick randomness from it (base-filter.ts:18, cuckoo-filter.ts:
        # 191-198) — same stream here, so kick sequences are bit-parity
        self._rng = SeedRandom(seed)

    @classmethod
    def create(cls, capacity: int, error_rate: float, bucket_size: int = 4,
               max_kicks: int = 500, seed: int = DEFAULT_SEED):
        f = compute_fingerprint_length(bucket_size, error_rate)
        n_buckets = math.ceil(capacity / bucket_size / 0.955)
        return cls(n_buckets, f, bucket_size, max_kicks, seed)

    @classmethod
    def from_items(cls, items, error_rate: float, bucket_size: int = 4,
                   max_kicks: int = 500, seed: int = DEFAULT_SEED):
        items = list(items)
        f = cls.create(len(items), error_rate, bucket_size, max_kicks, seed)
        for e in items:
            f.add(e)
        return f

    def _hash_element(self, element) -> int:
        """Engine addition: integer elements hash as their uint64
        little-endian bytes — the same domain as the vectorized
        ``xxh64_u64`` lanes used by the distributed build/probe paths.
        (The reference only accepts strings/bytes.)"""
        if isinstance(element, (int, np.integer)):
            return xxh64((int(element) & MASK64).to_bytes(8, "little"), self.seed)
        return xxh64(element, self.seed)

    def _locations(self, element):
        return self._locations_from_hash(self._hash_element(element))

    def _locations_from_hash(self, h: int):
        hex_str = format(h, "x")  # no zero padding — faithful
        fp = hex_str[: self.f_length]
        i1 = h % self.size
        i2 = (h ^ xxh64(fp, self.seed)) % self.size
        return fp, i1, i2

    def has_batch(self, elements) -> np.ndarray:
        """Batched probe: element hashes vectorize (uint64 lanes for
        integer arrays); the per-fingerprint ``xxh64(fp)`` — needed for
        the second bucket index — is memoized (there are at most
        16^f_length distinct fingerprints), and bucket membership checks
        run against cached per-bucket sets."""
        if len(elements) == 0:
            return np.zeros(0, dtype=bool)
        if isinstance(elements, np.ndarray) and elements.dtype in (
            np.dtype(np.int64), np.dtype(np.uint64),
        ):
            hs = xxh64_u64(elements.astype(np.uint64, copy=False), self.seed)
            hs = [int(v) for v in hs]
        else:
            hs = [self._hash_element(e) for e in elements]
        f = self.f_length
        cache = getattr(self, "_fp_hash_cache", None)
        if cache is None:
            cache = self._fp_hash_cache = {}
        bsets = getattr(self, "_bucket_sets", None)
        if bsets is None:
            bsets = self._bucket_sets = [set(b) for b in self.buckets]
        out = np.empty(len(hs), dtype=bool)
        size = self.size
        for i, h in enumerate(hs):
            fp = format(h, "x")[:f]
            fph = cache.get(fp)
            if fph is None:
                fph = cache[fp] = xxh64(fp, self.seed)
            out[i] = (
                fp in bsets[h % size] or fp in bsets[(h ^ fph) % size]
            )
        return out

    def _invalidate_probe_cache(self):
        self._bucket_sets = None

    def add(self, element) -> bool:
        self._invalidate_probe_cache()
        fp, i1, i2 = self._locations(element)
        if len(self.buckets[i1]) < self.bucket_size:
            self.buckets[i1].append(fp)
            self.length += 1
            return True
        if len(self.buckets[i2]) < self.bucket_size:
            self.buckets[i2].append(fp)
            self.length += 1
            return True
        # random kicks with rollback log
        index = i1 if self._rng.random() < 0.5 else i2
        moved_fp = fp
        log = []
        for _ in range(self.max_kicks):
            slot = self._rng.random_int(0, len(self.buckets[index]) - 1)
            log.append((index, slot, self.buckets[index][slot]))
            moved_fp, self.buckets[index][slot] = self.buckets[index][slot], moved_fp
            index = (index ^ xxh64(moved_fp, self.seed)) % self.size
            if len(self.buckets[index]) < self.bucket_size:
                self.buckets[index].append(moved_fp)
                self.length += 1
                return True
        # rollback
        for idx, slot, old in reversed(log):
            self.buckets[idx][slot] = old
        return False

    def has(self, element) -> bool:
        fp, i1, i2 = self._locations(element)
        return fp in self.buckets[i1] or fp in self.buckets[i2]

    def remove(self, element) -> bool:
        self._invalidate_probe_cache()
        fp, i1, i2 = self._locations(element)
        if fp in self.buckets[i1]:
            self.buckets[i1].remove(fp)
            self.length -= 1
            return True
        if fp in self.buckets[i2]:
            self.buckets[i2].remove(fp)
            self.length -= 1
            return True
        return False

    def rate(self) -> float:
        load = self.length / (self.size * self.bucket_size)
        return 2 ** (
            math.log2(2 * self.bucket_size) - load * (self.f_length / load)
        ) if load > 0 else 0.0

    def to_json_obj(self) -> dict:
        return {
            "_size": self.size,
            "_fingerprintLength": self.f_length,
            "_bucketSize": self.bucket_size,
            "_maxKicks": self.max_kicks,
            "_length": self.length,
            "_filter": [list(b) for b in self.buckets],
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "CuckooFilter":
        f = cls(obj["_size"], obj["_fingerprintLength"], obj["_bucketSize"],
                obj["_maxKicks"], import_bigint(obj["_seed"]))
        f.buckets = [list(b) for b in obj["_filter"]]
        f.length = obj["_length"]
        return f
