"""Hashing kernel: seeded XXH64 + enhanced double hashing.

Re-expresses the reference library's hashing contract
(``/root/reference/src/hashing.ts:23-95``) in Python/numpy:

* ``xxh64(data, seed)``       — classic XXH64 of bytes → unsigned 64-bit int
  (reference ``Hashing.serialize``, ``src/hashing.ts:73-78``, which delegates
  to ``@node-rs/xxhash``'s ``xxh64``).
* ``hash_twice(data, seed)``  — ``(xxh64(v, seed+1), xxh64(v, seed+2))``
  (reference ``src/hashing.ts:87-95``).
* ``double_hashing(n, hA, hB, size)`` — enhanced double hashing
  ``|(hA + n*hB + (n**3 - n//6)) mod size|`` in arbitrary-precision ints,
  exactly as the reference's BigInt arithmetic (``src/hashing.ts:23-33``).
* ``get_indexes(data, size, k, seed)`` — k indexes on ``[0, size)``
  (duplicates possible, same as reference warning at ``src/hashing.ts:39``).

Implementation is from the public XXH64 specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); no
reference code is copied.  Two paths:

* scalar pure-Python ``xxh64`` for arbitrary byte strings (used for
  sketch elements — strings/bytes),
* numpy-vectorized ``xxh64_u64`` for batches of fixed 8-byte inputs
  (uint64 lanes — the dedup hot path hashes int64 shingle hashes).
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 0x1234567890  # reference getDefaultSeed(), src/utils.ts:53-55


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * PRIME64_2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME64_1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME64_1) + PRIME64_4) & MASK64


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    h ^= h >> 32
    return h


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """Classic XXH64 of ``data`` with ``seed`` → unsigned 64-bit int."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    seed &= MASK64
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & MASK64
        v2 = (seed + PRIME64_2) & MASK64
        v3 = seed
        v4 = (seed - PRIME64_1) & MASK64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME64_5) & MASK64
    h = (h + n) & MASK64
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & MASK64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * PRIME64_1) & MASK64
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & MASK64
        pos += 4
    while pos < n:
        h ^= (data[pos] * PRIME64_5) & MASK64
        h = (_rotl(h, 11) * PRIME64_1) & MASK64
        pos += 1
    return _avalanche(h)


# ---------------------------------------------------------------------------
# numpy-vectorized XXH64 for batches of fixed 8-byte (uint64) inputs.
# Each input is the 8-byte little-endian encoding of a uint64 value —
# the natural shape for hashing int64 shingle hashes / doc ids at scale.
# ---------------------------------------------------------------------------

_NP_P1 = np.uint64(PRIME64_1)
_NP_P2 = np.uint64(PRIME64_2)
_NP_P3 = np.uint64(PRIME64_3)
_NP_P4 = np.uint64(PRIME64_4)
_NP_P5 = np.uint64(PRIME64_5)


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def xxh64_u64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over an array of uint64 values.

    Equivalent to ``xxh64(v.to_bytes(8, 'little'), seed)`` per element.
    """
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64, copy=False)
        h = np.uint64(seed & MASK64) + _NP_P5 + np.uint64(8)
        # one 8-byte tail round
        k1 = v * _NP_P2
        k1 = _np_rotl(k1, 31)
        k1 = k1 * _NP_P1
        h = h ^ k1
        h = _np_rotl(h, 27) * _NP_P1 + _NP_P4
        # avalanche
        h = h ^ (h >> np.uint64(33))
        h = h * _NP_P2
        h = h ^ (h >> np.uint64(29))
        h = h * _NP_P3
        h = h ^ (h >> np.uint64(32))
        return h


def hash_twice(data: bytes | str, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """(xxh64(v, seed+1), xxh64(v, seed+2)) — reference src/hashing.ts:87-95."""
    return xxh64(data, seed + 1), xxh64(data, seed + 2)


def hash_twice_u64(values: np.ndarray, seed: int = DEFAULT_SEED):
    """Vectorized hash_twice over uint64 lanes → (hA, hB) uint64 arrays."""
    return xxh64_u64(values, seed + 1), xxh64_u64(values, seed + 2)


def double_hashing(n: int, hash_a: int, hash_b: int, size: int) -> int:
    """Enhanced double hashing, reference src/hashing.ts:23-33.

    ``abs((hA + n*hB + (n**3 - n//6)) mod size)`` in unbounded ints —
    hA/hB are unsigned 64-bit so the result is already non-negative.
    """
    value = (hash_a + n * hash_b + (n**3 - n // 6)) % size
    return abs(value)


def get_indexes(
    data: bytes | str, size: int, hash_count: int, seed: int = DEFAULT_SEED
) -> list[int]:
    """k indexes on [0, size) via hashTwice + doubleHashing.

    Duplicate indexes are possible — faithful to the reference warning
    (src/hashing.ts:39).
    """
    ha, hb = hash_twice(data, seed)
    return [double_hashing(n, ha, hb, size) for n in range(hash_count)]


def _indexes_from_hashes(
    ha: np.ndarray, hb: np.ndarray, size: int, hash_count: int
) -> np.ndarray:
    """(n, hash_count) int64 index matrix from (n,) uint64 hash pairs.

    Exactly equals the reference's unbounded-int
    ``(hA + n*hB + (n**3 - n//6)) mod size``.  Fast path: reduce hA, hB
    mod size FIRST — valid because (a + b) mod s == (a mod s + b mod s)
    mod s — then everything fits in uint64 as long as
    ``hash_count * size < 2**62``.  Falls back to object dtype beyond.
    """
    n_el = len(ha)
    out = np.empty((n_el, hash_count), dtype=np.int64)
    s = np.uint64(size)
    if hash_count * size < 2**62:
        ham = ha % s  # (n,)
        hbm = hb % s
        for n in range(hash_count):
            floor = (n**3 - n // 6) % size
            with np.errstate(over="ignore"):
                vals = (ham + np.uint64(n) * hbm + np.uint64(floor)) % s
            out[:, n] = vals.astype(np.int64)
    else:
        ha_o = ha.astype(object)
        hb_o = hb.astype(object)
        for n in range(hash_count):
            floor = n**3 - n // 6
            out[:, n] = ((ha_o + n * hb_o + floor) % size).astype(np.int64)
    return out


def get_indexes_batch(
    elements, size: int, hash_count: int, seed: int = DEFAULT_SEED
) -> np.ndarray:
    """(len(elements), hash_count) int64 index matrix for a batch of
    string/bytes elements.  Python-loop over elements (variable-length
    input), numpy over the k hash functions."""
    ha = np.empty(len(elements), dtype=np.uint64)
    hb = np.empty(len(elements), dtype=np.uint64)
    s1, s2 = seed + 1, seed + 2
    for i, e in enumerate(elements):
        ha[i] = xxh64(e, s1)
        hb[i] = xxh64(e, s2)
    return _indexes_from_hashes(ha, hb, size, hash_count)


def get_indexes_u64(
    values: np.ndarray, size: int, hash_count: int, seed: int = DEFAULT_SEED
) -> np.ndarray:
    """Vectorized get_indexes for uint64-lane elements.

    Returns an (n, hash_count) int64 matrix of indexes in [0, size).
    Matches ``get_indexes(v.to_bytes(8,'little'), ...)`` per element.
    """
    ha, hb = hash_twice_u64(values, seed)
    return _indexes_from_hashes(ha, hb, size, hash_count)
