"""Shingling: text → hashed w-shingle sets, entirely JVM-side.

The reference's MinHash consumes *numbers*; mapping a document to a set
of numbers is the caller's job (``/root/reference/README.md:345``,
``src/sketch/min-hash.ts:83``).  We map text → w-word shingles →
``pmod(xxhash64(shingle), c)`` ∈ [0, c) — all with built-in Spark SQL
functions so the whole stage is whole-stage-codegen'd, no Python.

``xxhash64`` (seed 42) is bit-reproducible in our Python kernel
(``bloom_filters_spark.hashing.xxh64(b, 42)``), so oracles and
driver-side parity checks can recompute shingle hashes exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# default MinHash domain: c = 2^31 - 1 (a Mersenne prime, so
# closest_prime(2^31-1) == 2^31-1 and values fit the int64-exact kernel)
DEFAULT_MAX_VALUE = 2**31 - 1


def tokens_expr(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokens, empties removed."""
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))


def shingle_strings_expr(toks: Column, w: int) -> Column:
    """w-word shingle strings from a token array.

    Documents with fewer than w tokens produce one shingle (all tokens).
    """
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))


def shingles_expr(
    text: Column,
    w: int = 3,
    max_value: int = DEFAULT_MAX_VALUE,
    lowercase: bool = True,
) -> Column:
    """text → distinct array<long> of shingle hashes in [0, max_value].

    MinHash is set-based (the reference folds a *set* of numbers), hence
    ``array_distinct``.
    """
    strs = shingle_strings_expr(tokens_expr(text, lowercase), w)
    hashed = F.transform(strs, lambda s: F.pmod(F.xxhash64(s), F.lit(max_value)))
    return F.array_distinct(hashed)


def shingle_hash_py(shingle: str, max_value: int = DEFAULT_MAX_VALUE) -> int:
    """Python oracle for one shingle hash — bit-equal to the JVM column.

    ``pmod(xxhash64(s), m)`` where xxhash64 is Spark's seed-42 XXH64 over
    UTF-8 bytes, interpreted as SIGNED int64 (pmod of the signed value).
    """
    from bloom_filters_spark.hashing import xxh64

    h = xxh64(shingle.encode("utf-8"), 42)
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return signed % max_value


def shingle_set_py(
    text: str,
    w: int = 3,
    max_value: int = DEFAULT_MAX_VALUE,
    lowercase: bool = True,
) -> list[int]:
    """Python oracle for the full shingles_expr column (order-preserving
    distinct, like array_distinct)."""
    import re

    t = text.lower() if lowercase else text
    toks = [x for x in re.split(r"\s+", t) if x != ""]
    n = len(toks)
    n_shingles = max(n - w + 1, 1)
    out, seen = [], set()
    for i in range(n_shingles):
        h = shingle_hash_py(" ".join(toks[i : i + w]), max_value)
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out
