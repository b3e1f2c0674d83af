"""MinHash Jaccard sketch — vectorized elementwise-min monoid.

Semantics match the reference ``MinHash`` (``/root/reference/src/sketch/
min-hash.ts``) and ``MinHashFactory`` (``min-hash-factory.ts``):

* signature ``sig[i] = min over values x of (a_i*x + b_i) mod c``
  (``min-hash.ts:34-36,83-110``); empty signature = +inf sentinel,
* ``compareWith`` = (# equal positions)/k (``min-hash.ts:117-132``),
* ``closestPrime`` replicates the reference's trial division with the
  strict ``i < sqrt(x)`` bound — which (faithfully) classifies squares
  of primes such as 9 as prime (``min-hash-factory.ts:9-38``),
* the reference factory draws a,b from UNSEEDED lodash random
  (``min-hash-factory.ts:62-65``) so its params are nondeterministic;
  for reproducibility we draw from a seeded ``np.random.Generator`` —
  parity holds for any pinned ``{a, b, c}``.

Exactness: JS computes ``a*x + b`` in float64, exact below 2^53.  We
compute in int64 and require ``a, x <= 2^31`` so products stay below
2^62 — callers must keep ``max_value <= 2^31`` (the engine maps shingle
hashes into this domain).
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint

INF = float("inf")
MAX_SAFE_VALUE = 2**31  # keeps a*x + b within int64 (and JS float53) exactness


def is_prime(x: int) -> bool:
    """Reference isPrime incl. its strict sqrt bound bug
    (min-hash-factory.ts:9-19)."""
    if x != 2 and x % 2 == 0:
        return False
    i = 2
    while i < math.sqrt(x):
        if x % i == 0:
            return False
        i += 1
    return True


def closest_prime(x: int) -> int:
    """First 'prime' >= x per reference isPrime (min-hash-factory.ts:26-38)."""
    i = 0
    while True:
        if is_prime(x + i):
            return x + i
        i += 1


class MinHashFactory:
    """Generates the k affine hash functions shared by comparable MinHashes."""

    def __init__(self, nb_hashes: int, max_value: int, rng_seed: int = DEFAULT_SEED):
        if max_value > MAX_SAFE_VALUE:
            raise ValueError(f"max_value must be <= {MAX_SAFE_VALUE} for exact arithmetic")
        self.nb_hashes = nb_hashes
        self.max_value = max_value
        self.c = closest_prime(max_value)
        rng = np.random.default_rng(rng_seed)
        self.a = rng.integers(0, max_value + 1, size=nb_hashes, dtype=np.int64)
        self.b = rng.integers(0, max_value + 1, size=nb_hashes, dtype=np.int64)

    @classmethod
    def from_params(cls, a, b, c: int) -> "MinHashFactory":
        f = cls.__new__(cls)
        f.a = np.asarray(a, dtype=np.int64)
        f.b = np.asarray(b, dtype=np.int64)
        f.c = int(c)
        f.nb_hashes = len(f.a)
        f.max_value = int(c)
        return f

    def create(self) -> "MinHash":
        return MinHash(self.nb_hashes, self.a, self.b, self.c)

    def signature(self, values: np.ndarray) -> np.ndarray:
        """Vectorized bulkLoad for one set: (n,) int64 -> (k,) int64 signature.

        ``((outer(x, a) + b) % c).min(axis=0)`` — the reference's add-fold
        (min-hash.ts:94-110) as one numpy kernel.
        """
        x = np.asarray(values, dtype=np.int64)
        if x.size == 0:
            raise ValueError("cannot compute a signature for an empty set")
        return ((x[:, None] * self.a[None, :] + self.b[None, :]) % self.c).min(axis=0)

    def signatures(self, sets: list[np.ndarray]) -> np.ndarray:
        """Batch form: list of value arrays -> (len(sets), k) signatures."""
        return np.stack([self.signature(s) for s in sets])


class MinHash(SketchBase):
    def __init__(self, nb_hashes: int, a, b, c: int, seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.nb_hashes = nb_hashes
        self.a = np.asarray(a, dtype=np.int64)
        self.b = np.asarray(b, dtype=np.int64)
        self.c = int(c)
        self.signature = np.full(nb_hashes, INF)

    def is_empty(self) -> bool:
        return self.signature[0] == INF

    def add(self, value: int):
        self.bulk_load([value])

    def bulk_load(self, values):
        x = np.asarray(values, dtype=np.int64)
        if x.size == 0:
            return
        cand = ((x[:, None] * self.a[None, :] + self.b[None, :]) % self.c).min(axis=0)
        self.signature = np.minimum(self.signature, cand)

    def compare_with(self, other: "MinHash") -> float:
        if self.is_empty() or other.is_empty():
            raise ValueError(
                "Cannot compute a Jaccard similarity with a MinHash that contains no values"
            )
        return float((self.signature == other.signature).sum()) / self.nb_hashes

    def merge(self, other: "MinHash") -> "MinHash":
        out = MinHash(self.nb_hashes, self.a, self.b, self.c, self.seed)
        out.signature = np.minimum(self.signature, other.signature)
        return out

    def to_json_obj(self) -> dict:
        return {
            "_hashFunctions": [
                {"a": int(a), "b": int(b), "c": self.c}
                for a, b in zip(self.a.tolist(), self.b.tolist())
            ],
            "_nbHashes": self.nb_hashes,
            "_signature": [
                None if v == INF else int(v) for v in self.signature.tolist()
            ],
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "MinHash":
        fns = obj["_hashFunctions"]
        f = cls(
            obj["_nbHashes"],
            [fn["a"] for fn in fns],
            [fn["b"] for fn in fns],
            fns[0]["c"] if fns else 1,
            import_bigint(obj["_seed"]),
        )
        f.signature = np.array(
            [INF if v is None else v for v in obj["_signature"]], dtype=np.float64
        )
        return f


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """compareWith on raw signature arrays (min-hash.ts:117-132)."""
    return float((np.asarray(sig_a) == np.asarray(sig_b)).mean())
