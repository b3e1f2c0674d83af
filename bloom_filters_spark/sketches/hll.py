"""HyperLogLog as a numpy register-max monoid.

Semantics match the reference ``HyperLogLog``
(``/root/reference/src/sketch/hyperloglog.ts``), including its
nonstandard register update — the 64-bit hash's LOW ``b`` bits pick the
register and the register stores the 0-based *string position* of the
leftmost 1-bit in the high ``k = 64-b`` bits (default ``k-1`` when the
window is all zeros), NOT the standard rank (``hyperloglog.ts:95-123``).
The estimator compensates with a factor 2: ``E = alpha·m²·2/Z``
(``hyperloglog.ts:129-160``).

Hashing: byte-parity XXH3-64 (``hyperloglog.ts:96`` hashes with
``@node-rs/xxhash`` ``xxh3.xxh64(element, seed)``; our ``xxh3`` module
is validated bit-exact against libxxhash) — reference-serialized state
(`fromJSON`) therefore probes/merges correctly.  Integer batches use
the vectorized 8-byte XXH3 lane kernel (engine addition: the element
domain is the value's uint64 little-endian bytes).

merge = elementwise max (``hyperloglog.ts:175-189``).
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint
from bloom_filters_spark.xxh3 import xxh3_64, xxh3_64_u64

TWO_POW_32 = 2.0**32


def compute_alpha(m: int) -> float:
    """Reference computeAlpha (hyperloglog.ts:15-27)."""
    if m < 16:
        return 1.0
    if m < 32:
        return 0.673
    if m < 64:
        return 0.697
    if m < 128:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog(SketchBase):
    HASH_SIZE = 64

    def __init__(self, nb_registers: int, seed: int = DEFAULT_SEED):
        if nb_registers & (nb_registers - 1) != 0:
            raise ValueError("The number of registers should be a power of 2")
        super().__init__(seed)
        self.m = nb_registers
        self.b = int(math.ceil(math.log2(nb_registers)))
        self.correction_bias = compute_alpha(nb_registers)
        self.registers = np.zeros(self.m, dtype=np.int64)

    # -- updates -------------------------------------------------------------
    def _apply_hashes(self, h: np.ndarray):
        """Vectorized register update from an array of uint64 hashes."""
        k = self.HASH_SIZE - self.b
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        y = h >> np.uint64(self.b)  # high k bits
        # leftmost-1 string position = k - bit_length(y); k-1 when y == 0.
        # Exact uint64 bit length via 32-bit halves (float64 log2 is exact
        # for 32-bit ints; +0.5 guards the power-of-two boundary).
        hi = (y >> np.uint64(32)).astype(np.uint32)
        lo = y.astype(np.uint32)
        hi_bl = np.where(
            hi != 0,
            np.floor(np.log2(hi.astype(np.float64) + 0.5)).astype(np.int64) + 1,
            0,
        )
        lo_bl = np.where(
            lo != 0,
            np.floor(np.log2(lo.astype(np.float64) + 0.5)).astype(np.int64) + 1,
            0,
        )
        bl = np.where(hi != 0, hi_bl + 32, lo_bl)
        pos = np.where(bl > 0, k - bl, k - 1)
        np.maximum.at(self.registers, idx, pos)

    def update(self, element):
        self.update_batch([element])

    def update_batch(self, elements):
        if len(elements) == 0:
            return
        if isinstance(elements, np.ndarray) and elements.dtype in (
            np.dtype(np.uint64),
            np.dtype(np.int64),
        ):
            h = xxh3_64_u64(elements.astype(np.uint64), self.seed)
        else:
            h = np.array(
                [xxh3_64(e, self.seed) for e in elements], dtype=np.uint64
            )
        self._apply_hashes(h)

    # -- estimate --------------------------------------------------------------
    def count(self, round_result: bool = False) -> float:
        z = np.power(2.0, -self.registers.astype(np.float64)).sum()
        raw = (self.correction_bias * self.m * self.m * 2) / z
        if raw <= 2.5 * self.m:
            v = int((self.registers == 0).sum())
            est = self.m * math.log(self.m / v) if v > 0 else raw
        elif raw <= TWO_POW_32 / 30:
            est = raw
        else:
            est = -TWO_POW_32 * math.log(1 - raw / TWO_POW_32)
        return round(est) if round_result else est

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- monoid ------------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.m != other.m:
            raise ValueError("cannot merge HLLs with different register counts")
        out = HyperLogLog(self.m, self.seed)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def equals(self, other: "HyperLogLog") -> bool:
        return self.m == other.m and np.array_equal(self.registers, other.registers)

    def to_json_obj(self) -> dict:
        return {
            "_m": self.m,
            "_b": self.b,
            "_correctionBias": self.correction_bias,
            "_registers": self.registers.tolist(),
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "HyperLogLog":
        f = cls(obj["_m"], import_bigint(obj["_seed"]))
        f.registers = np.array(obj["_registers"], dtype=np.int64)
        return f
