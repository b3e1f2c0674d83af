"""XOR filter — immutable 3-wise membership structure.

Semantics match the reference ``XorFilter``
(``/root/reference/src/bloom/xor-filter.ts:60-291``): table of
``round3(ceil(1.23*n) + 32)`` fingerprints split into 3 blocks; probe
slots ``(h >> 21*i) mod blockLength + i*blockLength``; fingerprint
``asUintN(bits, h ^ (h >> 32))``; build via the standard peeling
algorithm, re-seeding until acyclic through the reference's exact
seedrandom retry chain (``seedrandom_rng.py``) — same build seeds,
same final table, and the exported JSON matches ``ExportedXorFilter``
field-for-field.

Hashing: byte-parity XXH3-64 (``xor-filter.ts:138-140`` hashes with
``@node-rs/xxhash`` ``xxh3.xxh64(element, seed)``; our ``xxh3`` module
is validated bit-exact against libxxhash) — a reference-serialized
filter (`fromJSON`) probes identically here.  Construction is
sequential by design → driver/executor-local; used for static
deny/seen lists broadcast to a membership UDF.  Integer elements are
an engine addition (uint64 little-endian byte domain, vectorized).
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint
from bloom_filters_spark.xxh3 import xxh3_64, xxh3_64_u64

HASHES = 3
ALLOWED_BITS = (8, 16, 32, 64)
MASK64 = (1 << 64) - 1

_INT_DTYPES = (np.dtype(np.int64), np.dtype(np.uint64))


def _is_u64_batch(elements) -> bool:
    return isinstance(elements, np.ndarray) and elements.dtype in _INT_DTYPES


class XorFilter(SketchBase):
    def __init__(self, size: int, bits_per_fingerprint: int = 8,
                 seed: int = DEFAULT_SEED):
        if bits_per_fingerprint not in ALLOWED_BITS:
            raise ValueError(f"bits_per_fingerprint must be one of {ALLOWED_BITS}")
        if size <= 0:
            raise ValueError("a XorFilter must be calibrated for a given number of elements")
        super().__init__(seed)
        self.bits = bits_per_fingerprint
        self.size = size
        array_length = self._optimal_filter_size(size)
        self.block_length = array_length // HASHES
        self.filter = np.zeros(array_length, dtype=np.uint64)
        self._build_seed = 0

    @staticmethod
    def _optimal_filter_size(size: int) -> int:
        # ceil(1.23*n) + 32, rounded up to a multiple of 3 (xor-filter.ts:275-280)
        l = math.ceil(1.23 * size) + 32
        return l + ((3 - (l % 3)) % 3)

    def _hash64(self, element, seed: int) -> int:
        if isinstance(element, (int, np.integer)):
            # same domain as the vectorized u64-lane path: the 8-byte
            # little-endian encoding of the value's uint64 view
            return xxh3_64((int(element) & MASK64).to_bytes(8, "little"), seed)
        return xxh3_64(element, seed)

    def _element_hashes(self, elements) -> list[int]:
        if _is_u64_batch(elements):
            h = xxh3_64_u64(elements.astype(np.uint64, copy=False),
                            self._build_seed)
            return [int(v) for v in h]
        return [self._hash64(k, self._build_seed) for k in elements]

    def _fingerprint(self, h: int) -> int:
        return (h ^ (h >> 32)) & ((1 << self.bits) - 1)

    def _hx(self, index: int, h: int) -> int:
        # (h >> 21*i) mod blockLength (xor-filter.ts:146-150)
        return (h >> (21 * index)) % self.block_length

    def has(self, element) -> bool:
        h = self._hash64(element, self._build_seed)
        fp = self._fingerprint(h)
        x = 0
        for i in range(HASHES):
            x ^= int(self.filter[self._hx(i, h) + i * self.block_length])
        return fp == x

    def has_batch(self, elements) -> np.ndarray:
        if _is_u64_batch(elements):
            # fully vectorized probe: one xxh64_u64 pass + 3 gathers
            with np.errstate(over="ignore"):
                h = xxh3_64_u64(elements.astype(np.uint64, copy=False),
                                self._build_seed)
                fp = (h ^ (h >> np.uint64(32))) & np.uint64(
                    (1 << self.bits) - 1 if self.bits < 64 else MASK64
                )
                x = np.zeros(len(h), dtype=np.uint64)
                bl = np.uint64(self.block_length)
                for i in range(HASHES):
                    slot = (h >> np.uint64(21 * i)) % bl + np.uint64(i) * bl
                    x ^= self.filter[slot.astype(np.int64)]
                return fp == x
        return np.array([self.has(e) for e in elements], dtype=bool)

    def add(self, elements):
        if len(elements) != self.size:
            raise ValueError(f"This filter has been created for exactly {self.size} elements")
        n_unique = (
            len(np.unique(elements))
            if isinstance(elements, np.ndarray)
            else len(set(elements))
        )
        if n_unique != len(elements):
            raise ValueError("This filter has duplicate values")
        self._create(elements)
        return self

    @classmethod
    def from_items(cls, elements, bits_per_fingerprint: int = 8,
                   seed: int = DEFAULT_SEED) -> "XorFilter":
        if not isinstance(elements, np.ndarray):
            elements = list(elements)
        f = cls(len(elements), bits_per_fingerprint, seed)
        f.add(elements)
        return f

    def _create(self, elements):
        n = self.size
        table_len = len(self.filter)
        # Reference retry chain (xor-filter.ts:159-165): `this.seed = 0n`,
        # then each attempt draws ONE int32 from seedrandom(str(seed))
        # and re-seeds with it — the build-seed sequence is a fixed
        # universal chain starting from "0", independent of the ctor
        # seed.  Bit-parity: a reference build of the same items lands
        # on the identical seed and therefore the identical table.
        from bloom_filters_spark.seedrandom_rng import SeedRandom

        build_seed = 0
        while True:
            build_seed = SeedRandom(build_seed).int32()
            self._build_seed = build_seed
            t2count = np.zeros(table_len, dtype=np.int64)
            t2 = np.zeros(table_len, dtype=object)
            t2[:] = 0
            hashes = self._element_hashes(elements)
            ok = True
            for h in hashes:
                for hi in range(HASHES):
                    slot = self._hx(hi, h) + hi * self.block_length
                    t2[slot] ^= h
                    if t2count[slot] > 120:
                        ok = False
                        break
                    t2count[slot] += 1
                if not ok:
                    break
            if not ok:
                continue
            # peel
            stack = [i for i in range(table_len) if t2count[i] == 1]
            reverse_order, reverse_h = [], []
            while stack:
                i = stack.pop()
                if t2count[i] != 1:
                    continue
                k = t2[i]
                found = i // self.block_length
                t2count[i] -= 1
                for hi in range(HASHES):
                    if hi != found:
                        slot = self._hx(hi, k) + hi * self.block_length
                        t2count[slot] -= 1
                        t2[slot] ^= k
                        if t2count[slot] == 1:
                            stack.append(slot)
                reverse_order.append(k)
                reverse_h.append(found)
            if len(reverse_order) == n:
                break
        # assign fingerprints in reverse peel order
        mask = (1 << self.bits) - 1
        for i in range(len(reverse_order) - 1, -1, -1):
            k = reverse_order[i]
            found = reverse_h[i]
            change = -1
            x = self._fingerprint(k)
            for hi in range(HASHES):
                slot = self._hx(hi, k) + hi * self.block_length
                if hi == found:
                    change = slot
                else:
                    x ^= int(self.filter[slot])
            self.filter[change] = np.uint64(x & mask)

    def to_json_obj(self) -> dict:
        # ExportedXorFilter shape (xor-filter.ts:8-14): `_seed` is the
        # successful BUILD seed — after `_create`, the reference's
        # `this._seed` IS the build seed (the ctor seed is overwritten)
        return {
            "_size": self.size,
            "_bits": self.bits,
            "_blockLength": self.block_length,
            "_filter": [export_bigint(int(v)) for v in self.filter],
            "_seed": export_bigint(self._build_seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "XorFilter":
        build_seed = import_bigint(
            obj.get("_buildSeed", obj["_seed"])  # legacy round-4 JSON
        )
        f = cls(obj["_size"], obj["_bits"], build_seed)
        f.block_length = obj["_blockLength"]
        f.filter = np.array(
            [import_bigint(v) & MASK64 for v in obj["_filter"]],
            dtype=np.uint64,
        )
        f._build_seed = build_seed
        return f
