"""Hashing kernel parity tests.

Mirrors the reference's own oracle style: ``tests/utils.test.ts:35-56``
recomputes doubleHashing from first principles; XXH64 is checked against
the public specification vectors.
"""

import numpy as np
import pytest

from bloom_filters_spark.hashing import (
    DEFAULT_SEED,
    double_hashing,
    get_indexes,
    get_indexes_batch,
    get_indexes_u64,
    hash_twice,
    xxh64,
    xxh64_u64,
)


def test_xxh64_spec_vectors():
    # widely-published XXH64 vectors
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"", 2654435761) == 0xAC75FDA2929B17EF
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_xxh64_string_and_bytes_agree():
    assert xxh64("héllo", 7) == xxh64("héllo".encode("utf-8"), 7)


def test_xxh64_u64_matches_scalar():
    vals = np.array([0, 1, 2**31, 2**63, 12345678901234567, 2**64 - 1],
                    dtype=np.uint64)
    for seed in (0, 42, DEFAULT_SEED, DEFAULT_SEED + 1):
        vec = xxh64_u64(vals, seed)
        for v, h in zip(vals.tolist(), vec.tolist()):
            assert xxh64(int(v).to_bytes(8, "little"), seed) == h


def test_double_hashing_oracle():
    # independent re-derivation, as the reference test does
    # (tests/utils.test.ts:35-56)
    ha, hb = hash_twice(b"foo")
    size = 1000
    for n in range(1, 11):
        expected = abs((ha + n * hb + (n**3 - n // 6)) % size)
        assert double_hashing(n, ha, hb, size) == expected


def test_hash_twice_uses_seed_plus_1_and_2():
    ha, hb = hash_twice(b"foo", 100)
    assert ha == xxh64(b"foo", 101)
    assert hb == xxh64(b"foo", 102)
    assert ha != hb


def test_get_indexes_within_range_and_deterministic():
    idx = get_indexes("alice", 1000, 7)
    assert len(idx) == 7
    assert all(0 <= i < 1000 for i in idx)
    assert idx == get_indexes("alice", 1000, 7)


def test_get_indexes_batch_matches_scalar():
    elems = ["alice", "bob", "carl", "日本語"]
    m = get_indexes_batch(elems, 123, 5)
    for i, e in enumerate(elems):
        assert m[i].tolist() == get_indexes(e, 123, 5)


def test_get_indexes_u64_matches_scalar_bytes():
    vals = np.array([3, 99, 2**62], dtype=np.uint64)
    m = get_indexes_u64(vals, 777, 4)
    for i, v in enumerate(vals.tolist()):
        assert m[i].tolist() == get_indexes(int(v).to_bytes(8, "little"), 777, 4)
