"""Invertible Bloom Lookup Table — set reconciliation sketch.

Semantics match the reference ``InvertibleBloomFilter``
(``/root/reference/src/iblt/invertible-bloom-lookup-tables.ts``):

* ``size = ceil(alpha * d)`` rounded up to a multiple of k
  (``invertible-bloom-lookup-tables.ts:65-76``),
* cells ``{idSum: bytes (XOR with leading-zero strip, src/utils.ts:64-85),
  hashSum: int32 (XOR), count: int}`` (``src/iblt/cell.ts:17-67``),
* ``substract`` = cellwise XOR / count-diff (``:152-168``),
* ``decode`` peels pure cells (count = ±1 and genHash(idSum) == hashSum)
  → {additional, missing, success} (``:212-283``).

Hashing: byte-parity XXH3-128 exactly as the reference computes it
(``:170-205``): ``genHash`` = first 4 bytes of ``xxh128(value,
125).toString(16)`` hex-PAIRS read as a SIGNED int32 (the hex string is
unpadded, so a leading zero nibble shifts every byte pair — quirk kept);
``genIndexes`` consumes successive signed-int32 chunks of
``xxh128(value, salt)`` for salt = 0, 1, ... with ``abs(h % size)`` and
NO duplicate-index dedup.  Note the reference ignores the filter's own
seed in both (fixed 125 / bare salt) — also kept.  Our ``xxh3`` module
is validated bit-exact against libxxhash, so reference-serialized IBLT
state (`fromJSON`) subtracts/decodes identically.

In the engine, ``A.substract(B).decode()`` is the sketch-parity version
of ``A exceptAll B`` — used for cheap checkpoint-diff tooling; the
relational path is a full_outer join.
"""

from __future__ import annotations

import math

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint
from bloom_filters_spark.xxh3 import xxh3_128


def _hex_digest(value: bytes, seed: int) -> bytes:
    """digest = successive byte PAIRS of the unpadded hex string of the
    128-bit hash (reference ``hash.match(/../g)``): an odd-length hex
    string drops its last nibble — faithful quirk."""
    hex_str = format(xxh3_128(value, seed), "x")
    return bytes(
        int(hex_str[i:i + 2], 16) for i in range(0, len(hex_str) - 1, 2)
    )


def _int32_at(digest: bytes, i: int) -> int:
    """First 4 digest bytes from offset as a SIGNED 32-bit int (the
    reference accumulates with JS ``h <<= 8; h |= b`` on int32).
    A partial trailing chunk is zero-padded on the RIGHT: the JS loop
    reads out-of-bounds ``digest[j]`` as ``undefined`` and
    ``undefined & 0xff === 0``, so the shift still happens with a 0
    byte (invertible-bloom-lookup-tables.ts:194-199 quirk kept)."""
    chunk = digest[i:i + 4].ljust(4, b"\x00")
    v = int.from_bytes(chunk, "big")
    return v - 0x100000000 if v >= 0x80000000 else v


def xor_bytes(a: bytes, b: bytes) -> bytes:
    """Non-destructive right-aligned XOR with leading-zero strip
    (reference xorUint8Array, src/utils.ts:64-85)."""
    n = max(len(a), len(b))
    a = a.rjust(n, b"\x00")
    b = b.rjust(n, b"\x00")
    out = bytes(x ^ y for x, y in zip(a, b))
    return out.lstrip(b"\x00")


class InvertibleBloomFilter(SketchBase):
    def __init__(self, size: int, hash_count: int = 3, seed: int = DEFAULT_SEED,
                 alpha: float | None = None):
        if hash_count <= 0:
            raise ValueError("hash_count must be positive")
        super().__init__(seed)
        self.hash_count = hash_count
        self.size = size
        self.id_sums: list[bytes] = [b"" for _ in range(size)]
        self.hash_sums = [0] * size
        self.counts = [0] * size

    @classmethod
    def create(cls, d: int, alpha: float = 2.0, hash_count: int = 3,
               seed: int = DEFAULT_SEED):
        # reference constructor (invertible-bloom-lookup-tables.ts:73-74)
        # adds a FULL hash_count when size is already a multiple of it
        # (no outer % hash_count) — quirk kept so substract() against a
        # reference-built IBLT of the same d passes the size check.
        size = math.ceil(alpha * d)
        size += hash_count - (size % hash_count)
        return cls(size, hash_count, seed)

    def _gen_hash(self, data: bytes) -> int:
        # reference genHash (:170-181): xxh128(value, 125) hex pairs,
        # first 4 bytes as signed int32
        return _int32_at(_hex_digest(data, 125), 0)

    def _gen_indexes(self, data: bytes) -> list[int]:
        # reference genIndexes (:183-205): consume signed-int32 chunks of
        # xxh128(value, salt) for salt = 0, 1, ...; duplicates allowed;
        # abs(h % size) with JS trunc-mod == abs(h) % size
        out: list[int] = []
        salt = 0
        while len(out) < self.hash_count:
            digest = _hex_digest(data, salt)
            salt += 1
            # JS loop bound is i < digest.length / 4 (a FLOAT), so a
            # 15-byte digest yields FOUR chunks — the partial trailing
            # chunk reads OOB bytes as 0 (see _int32_at).  ceil, not
            # floor (invertible-bloom-lookup-tables.ts:194).
            for i in range(-(-len(digest) // 4)):
                if len(out) >= self.hash_count:
                    break
                out.append(abs(_int32_at(digest, 4 * i)) % self.size)
        return out

    def _apply(self, element: str | bytes, delta: int):
        data = element.encode("utf-8") if isinstance(element, str) else element
        chk = self._gen_hash(data)
        for idx in self._gen_indexes(data):
            self.id_sums[idx] = xor_bytes(self.id_sums[idx], data)
            self.hash_sums[idx] ^= chk
            self.counts[idx] += delta

    def add(self, element):
        self._apply(element, 1)

    def add_batch(self, elements):
        for e in elements:
            self.add(e)

    def remove(self, element):
        self._apply(element, -1)

    def has(self, element):
        """'maybe'/True/False membership per the reference semantics."""
        data = element.encode("utf-8") if isinstance(element, str) else element
        for idx in self._gen_indexes(data):
            if self.counts[idx] == 0:
                return False
            if self.counts[idx] == 1:
                return self.id_sums[idx] == data.lstrip(b"\x00")
        return "maybe"

    def substract(self, other: "InvertibleBloomFilter") -> "InvertibleBloomFilter":
        if self.size != other.size or self.hash_count != other.hash_count:
            raise ValueError("cannot subtract IBLTs with different configs")
        out = InvertibleBloomFilter(self.size, self.hash_count, self.seed)
        for i in range(self.size):
            out.id_sums[i] = xor_bytes(self.id_sums[i], other.id_sums[i])
            out.hash_sums[i] = self.hash_sums[i] ^ other.hash_sums[i]
            out.counts[i] = self.counts[i] - other.counts[i]
        return out

    def _is_pure(self, i: int) -> bool:
        if self.counts[i] not in (1, -1):
            return False
        return self._gen_hash(self.id_sums[i]) == self.hash_sums[i]

    def decode(self):
        """Peel pure cells → {additional, missing, success}."""
        additional, missing = [], []
        work = InvertibleBloomFilter(self.size, self.hash_count, self.seed)
        work.id_sums = list(self.id_sums)
        work.hash_sums = list(self.hash_sums)
        work.counts = list(self.counts)
        queue = [i for i in range(work.size) if work._is_pure(i)]
        while queue:
            i = queue.pop()
            if not work._is_pure(i):
                continue
            data = work.id_sums[i]
            if work.counts[i] == 1:
                additional.append(data)
                work._apply(data, -1)
            else:
                missing.append(data)
                work._apply(data, 1)
            queue.extend(j for j in range(work.size) if work._is_pure(j))
        success = all(
            c == 0 and h == 0 and s == b""
            for c, h, s in zip(work.counts, work.hash_sums, work.id_sums)
        )
        return {"additional": additional, "missing": missing, "success": success}

    def list_entries(self):
        return self.decode()["additional"]

    def to_json_obj(self) -> dict:
        import base64

        return {
            "_size": self.size,
            "_hashCount": self.hash_count,
            "_elements": [
                {
                    "_idSum": base64.b64encode(s).decode("ascii"),
                    "_hashSum": h,
                    "_count": c,
                }
                for s, h, c in zip(self.id_sums, self.hash_sums, self.counts)
            ],
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "InvertibleBloomFilter":
        import base64

        f = cls(obj["_size"], obj["_hashCount"], import_bigint(obj["_seed"]))
        f.id_sums = [base64.b64decode(e["_idSum"]) for e in obj["_elements"]]
        f.hash_sums = [e["_hashSum"] for e in obj["_elements"]]
        f.counts = [e["_count"] for e in obj["_elements"]]
        return f
