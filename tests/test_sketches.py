"""Sketch kernel tests — ports of the reference Jest suites (SURVEY.md §5.1).

Layers: exact unit semantics on tiny inputs, statistical envelopes,
serialization round-trips, and monoid (merge) laws.
"""

import json
import random

import numpy as np
import pytest

from bloom_filters_spark.sketches import (
    BloomFilter,
    CountingBloomFilter,
    CountMinSketch,
    CuckooFilter,
    HyperLogLog,
    InvertibleBloomFilter,
    MinHash,
    MinHashFactory,
    PartitionedBloomFilter,
    ScalableBloomFilter,
    TopK,
    XorFilter,
)
from bloom_filters_spark.sketches.minhash import closest_prime, is_prime


# ---------------------------------------------------------------------------
# Bloom filter — reference tests/bloom-filter.test.ts
# ---------------------------------------------------------------------------

class TestBloomFilter:
    def test_sizing_formula(self):
        # m = ceil(-n ln eps / ln^2 2), k = ceil((m/n) ln 2)
        f = BloomFilter.create(1000, 0.01)
        assert f.size == 9586
        assert f.nb_hashes == 7

    def test_membership_tiny(self):
        f = BloomFilter.from_items(["alice", "bob", "carl"], 0.1)
        assert f.has("alice") and f.has("bob") and f.has("carl")
        assert not f.has("daniel")
        assert not f.has("al")

    def test_no_false_negatives_and_fpr_envelope(self):
        n = 10000
        items = [str(i) for i in range(n)]
        f = BloomFilter.from_items(items, 0.01)
        assert f.has_batch(items).all()
        probes = [f"neg-{i}" for i in range(n)]
        fpr = f.has_batch(probes).mean()
        assert fpr <= 0.03, fpr

    def test_merge_is_or(self):
        a = BloomFilter(256, 3)
        b = BloomFilter(256, 3)
        a.add_batch(["x", "y"])
        b.add_batch(["z"])
        m = a.merge(b)
        assert m.has("x") and m.has("y") and m.has("z")
        assert np.array_equal(m.bits, np.bitwise_or(a.bits, b.bits))

    def test_json_roundtrip(self):
        f = BloomFilter.from_items(["alice", "bob"], 0.01)
        g = BloomFilter.from_json(f.save_as_json())
        assert f.equals(g)
        obj = json.loads(f.save_as_json())
        assert set(obj) == {"_size", "_nbHashes", "_filter", "_seed"}
        assert obj["_seed"] == {"$bf$bigint": str(0x1234567890)}

    def test_u64_batch_matches_bytes(self):
        f = BloomFilter(2048, 5)
        vals = np.array([1, 2**40, 17], dtype=np.uint64)
        f.add_batch(vals)
        g = BloomFilter(2048, 5)
        g.add_batch([int(v).to_bytes(8, "little") for v in vals.tolist()])
        assert f.equals(g)


# ---------------------------------------------------------------------------
# Counting Bloom — reference tests/counting-bloom-filter.test.ts
# ---------------------------------------------------------------------------

class TestCountingBloom:
    def test_add_remove_has(self):
        f = CountingBloomFilter.create(100, 0.01)
        f.add("alice")
        f.add("bob")
        assert f.has("alice") and f.has("bob")
        f.remove("bob")
        assert not f.has("bob")
        assert f.has("alice")

    def test_no_false_negatives(self):
        items = [str(i) for i in range(5000)]
        f = CountingBloomFilter.create(5000, 0.01)
        f.add_batch(items)
        assert f.has_batch(items).all()

    def test_merge_sums_counters(self):
        a = CountingBloomFilter(128, 3)
        b = CountingBloomFilter(128, 3)
        a.add("x")
        b.add("x")
        m = a.merge(b)
        assert m.has("x")
        m.remove("x")
        assert m.has("x")  # counter was 2, still 1 after one removal

    def test_json_roundtrip(self):
        f = CountingBloomFilter.create(50, 0.1)
        f.add_batch(["a", "b", "c"])
        g = CountingBloomFilter.from_json(f.save_as_json())
        assert f.equals(g)
        assert g.length == 3


# ---------------------------------------------------------------------------
# Partitioned Bloom — reference tests/partitioned-bloom-filter.test.ts
# ---------------------------------------------------------------------------

class TestPartitionedBloom:
    def test_membership(self):
        f = PartitionedBloomFilter.from_items(["alice", "bob", "carl"], 0.1)
        assert f.has("alice") and f.has("bob") and f.has("carl")
        assert not f.has("daniel")

    def test_no_false_negatives_envelope(self):
        items = [str(i) for i in range(10000)]
        f = PartitionedBloomFilter.from_items(items, 0.01)
        assert f.has_batch(items).all()
        fpr = f.has_batch([f"neg-{i}" for i in range(10000)]).mean()
        assert fpr <= 0.03

    def test_json_roundtrip(self):
        f = PartitionedBloomFilter.from_items(["a", "b"], 0.1)
        g = PartitionedBloomFilter.from_json(f.save_as_json())
        assert f.equals(g)

    def test_merge(self):
        f = PartitionedBloomFilter.create(100, 0.01)
        g = PartitionedBloomFilter.create(100, 0.01)
        f.add("x")
        g.add("y")
        m = f.merge(g)
        assert m.has("x") and m.has("y")


# ---------------------------------------------------------------------------
# Scalable Bloom — reference tests/scalable-bloom-filter.test.ts
# ---------------------------------------------------------------------------

class TestScalableBloom:
    def test_grows_and_no_false_negatives(self):
        f = ScalableBloomFilter(128, 0.0001)
        items = [str(i) for i in range(10240)]
        for e in items:
            f.add(e)
        assert len(f.filters) > 1
        for e in random.Random(1).sample(items, 500):
            assert f.has(e)

    def test_tightening_ratio(self):
        f = ScalableBloomFilter(128, 0.001)
        for i in range(5000):
            f.add(str(i))
        rates = [flt.error_rate for flt in f.filters]
        for prev, nxt in zip(rates, rates[1:]):
            assert nxt == pytest.approx(prev * 0.8)

    def test_json_roundtrip(self):
        f = ScalableBloomFilter(128, 0.01)
        for i in range(500):
            f.add(str(i))
        g = ScalableBloomFilter.from_json(f.save_as_json())
        assert len(g.filters) == len(f.filters)
        assert all(a.equals(b) for a, b in zip(f.filters, g.filters))


# ---------------------------------------------------------------------------
# Count-Min Sketch — reference tests/count-min-sketch.test.ts
# ---------------------------------------------------------------------------

class TestCountMinSketch:
    def test_exact_counts_tiny(self):
        f = CountMinSketch.create(0.001)
        f.update("foo")
        f.update("foo")
        f.update("foo")
        f.update("bar")
        assert f.count("foo") == 3
        assert f.count("bar") == 1
        assert f.count("moo") == 0

    def test_merge(self):
        a = CountMinSketch.create(0.001)
        b = CountMinSketch.create(0.001)
        a.update("foo")
        a.update("foo")
        a.update("foo")
        a.update("bar")
        b.update("foo")
        b.update("bar")
        b.update("moo")
        b.update("moo")
        m = a.merge(b)
        assert m.count("foo") == 4
        assert m.count("bar") == 2
        assert m.count("moo") == 2
        assert m.all_sums == a.all_sums + b.all_sums

    def test_create_quirk_d1(self):
        # delta=0.999 gives d = ceil(ln(1/0.999)) = 1 — faithful quirk
        f = CountMinSketch.create(0.001, 0.999)
        assert f.rows == 1

    def test_overcount_envelope(self):
        rng = random.Random(42)
        keys = [str(i) for i in range(1000)]
        stream = [rng.choice(keys) for _ in range(100000)]
        f = CountMinSketch.create(1e-4, 0.999)
        from collections import Counter

        exact = Counter(stream)
        elems = list(exact)
        counts = np.array([exact[e] for e in elems], dtype=np.int64)
        f.update_batch(elems, counts)
        eps = 1e-4
        est = f.count_batch(elems)
        assert (est >= counts).all()
        assert (est <= counts + eps * f.all_sums + 1).mean() > 0.95

    def test_batched_equals_sequential(self):
        a = CountMinSketch(100, 3)
        b = CountMinSketch(100, 3)
        for e in ["x", "y", "x", "z"]:
            a.update(e)
        b.update_batch(["x", "y", "z"], np.array([2, 1, 1]))
        assert np.array_equal(a.matrix, b.matrix)

    def test_json_roundtrip(self):
        f = CountMinSketch.create(0.01)
        f.update("foo", 5)
        g = CountMinSketch.from_json(f.save_as_json())
        assert np.array_equal(f.matrix, g.matrix)
        assert g.all_sums == 5
        assert g.count("foo") == 5


# ---------------------------------------------------------------------------
# HyperLogLog — reference tests/hyperloglog.test.ts
# ---------------------------------------------------------------------------

class TestHyperLogLog:
    def test_three_sigma_envelope(self):
        m = 256
        n = 100000
        f = HyperLogLog(m)
        f.update_batch([str(i) for i in range(n)])
        sigma = 1.04 / np.sqrt(m)
        assert abs(f.count() - n) <= 3 * sigma * n

    def test_merge_is_elementwise_max(self):
        a = HyperLogLog(64)
        b = HyperLogLog(64)
        a.update_batch(["alice", "bob"])
        b.update_batch(["carol", "bob"])
        m = a.merge(b)
        assert np.array_equal(m.registers, np.maximum(a.registers, b.registers))
        # merged estimate >= each part's estimate
        assert m.count() >= max(a.count(), b.count()) - 1e-9

    def test_u64_batch_matches_bytes(self):
        a = HyperLogLog(128)
        b = HyperLogLog(128)
        vals = np.arange(1000, dtype=np.uint64)
        a.update_batch(vals)
        b.update_batch([int(v).to_bytes(8, "little") for v in vals.tolist()])
        assert a.equals(b)

    def test_json_roundtrip(self):
        f = HyperLogLog(32)
        f.update_batch(["a", "b", "c"])
        g = HyperLogLog.from_json(f.save_as_json())
        assert f.equals(g)
        assert f.count() == g.count()

    def test_register_semantics_manual(self):
        # one element, checked against a hand-computed register update
        from bloom_filters_spark.hashing import DEFAULT_SEED, xxh64

        f = HyperLogLog(16)
        f.update("foo")
        h = xxh64("foo", DEFAULT_SEED)
        bits = format(h, "064b")
        idx = int(bits[-4:], 2)  # low b=4 bits
        window = bits[:60]
        pos = window.index("1") if "1" in window else 59
        assert f.registers[idx] == pos


# ---------------------------------------------------------------------------
# MinHash — reference tests/min-hash.test.ts
# ---------------------------------------------------------------------------

def exact_jaccard(a, b):
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb)


class TestMinHash:
    def test_closest_prime_replicates_quirk(self):
        # reference isPrime uses i < sqrt(x): classifies 9 (=3^2) as prime
        assert is_prime(9)
        assert not is_prime(15)
        assert closest_prime(8) == 9

    def test_jaccard_close_to_exact(self):
        set_a = np.arange(1, 10000, dtype=np.int64)
        set_b = np.array([x * 2 if x % 2 == 1 else x for x in range(1, 10000)],
                         dtype=np.int64)
        max_value = int(max(set_a.max(), set_b.max()))
        factory = MinHashFactory(50, max_value)
        ma = factory.create()
        mb = factory.create()
        ma.bulk_load(set_a)
        mb.bulk_load(set_b)
        est = ma.compare_with(mb)
        exact = exact_jaccard(set_a.tolist(), set_b.tolist())
        assert abs(est - exact) <= 0.12

    def test_add_equals_bulk_load(self):
        factory = MinHashFactory(16, 1000)
        a = factory.create()
        b = factory.create()
        for v in [5, 99, 400]:
            a.add(v)
        b.bulk_load([5, 99, 400])
        assert np.array_equal(a.signature, b.signature)

    def test_empty_raises(self):
        factory = MinHashFactory(8, 100)
        a = factory.create()
        b = factory.create()
        b.add(1)
        with pytest.raises(ValueError):
            a.compare_with(b)

    def test_identical_sets_similarity_one(self):
        factory = MinHashFactory(32, 10000)
        a = factory.create()
        b = factory.create()
        vals = np.array([3, 141, 592, 6535], dtype=np.int64)
        a.bulk_load(vals)
        b.bulk_load(vals)
        assert a.compare_with(b) == 1.0

    def test_signature_formula(self):
        # sig[i] = min((a_i*x + b_i) mod c) — checked by hand
        f = MinHashFactory.from_params([3, 5], [1, 2], 97)
        sig = f.signature(np.array([10, 20]))
        assert sig[0] == min((3 * 10 + 1) % 97, (3 * 20 + 1) % 97)
        assert sig[1] == min((5 * 10 + 2) % 97, (5 * 20 + 2) % 97)

    def test_merge_is_min(self):
        factory = MinHashFactory(8, 1000)
        a = factory.create()
        b = factory.create()
        a.bulk_load([1, 2, 3])
        b.bulk_load([4, 5, 6])
        m = a.merge(b)
        c = factory.create()
        c.bulk_load([1, 2, 3, 4, 5, 6])
        assert np.array_equal(m.signature, c.signature)

    def test_json_roundtrip(self):
        factory = MinHashFactory(8, 1000)
        a = factory.create()
        a.bulk_load([1, 2, 3])
        b = MinHash.from_json(a.save_as_json())
        assert np.array_equal(a.signature, b.signature)
        assert a.compare_with(b) == 1.0


# ---------------------------------------------------------------------------
# TopK — reference tests/topk.test.ts
# ---------------------------------------------------------------------------

class TestTopK:
    ITEMS = ["alice", "daniel", "esther", "bob", "alice", "bob", "alice",
             "carol", "carol", "alice", "bob"]

    def test_expected_ranking(self):
        t = TopK(3, 0.001, 0.999)
        t.add_batch(self.ITEMS)
        vals = t.values()
        assert [v["value"] for v in vals] == ["alice", "bob", "carol"]
        assert [v["frequency"] for v in vals] == [4, 3, 2]
        assert [v["rank"] for v in vals] == [1, 2, 3]

    def test_batched_counts_equivalence(self):
        t1 = TopK(3, 0.001, 0.999)
        t1.add_batch(self.ITEMS)
        from collections import Counter

        t2 = TopK(3, 0.001, 0.999)
        for v, c in Counter(self.ITEMS).items():
            t2.add(v, c)
        assert [x["value"] for x in t1.values()] == [x["value"] for x in t2.values()]
        assert [x["frequency"] for x in t1.values()] == [
            x["frequency"] for x in t2.values()
        ]

    def test_rejects_nonpositive_count(self):
        t = TopK(3, 0.001, 0.999)
        with pytest.raises(ValueError):
            t.add("x", 0)

    def test_json_roundtrip(self):
        t = TopK(3, 0.001, 0.999)
        t.add_batch(self.ITEMS)
        u = TopK.from_json(t.save_as_json())
        assert t.values() == u.values()


# ---------------------------------------------------------------------------
# XOR filter — reference tests/xor-filter.test.ts
# ---------------------------------------------------------------------------

class TestXorFilter:
    @pytest.mark.parametrize("bits", [8, 16, 32, 64])
    def test_tp_tn_rates(self, bits):
        items = [f"hash:{i}" for i in range(1000)]
        f = XorFilter.from_items(items, bits)
        tp = np.mean([f.has(e) for e in items])
        tn = np.mean([not f.has(f"other:{i}") for i in range(1000)])
        assert tp == 1.0  # XOR filters have no false negatives
        assert tn >= 0.99

    def test_rejects_wrong_cardinality_and_dups(self):
        f = XorFilter(3, 8)
        with pytest.raises(ValueError):
            f.add(["a", "b"])
        with pytest.raises(ValueError):
            f.add(["a", "a", "b"])

    def test_json_roundtrip(self):
        f = XorFilter.from_items(["a", "b", "c"], 16)
        g = XorFilter.from_json(f.save_as_json())
        assert g.has("a") and g.has("b") and g.has("c")
        assert np.array_equal(f.filter, g.filter)


# ---------------------------------------------------------------------------
# Cuckoo filter — reference tests/cuckoo-filter.test.ts
# ---------------------------------------------------------------------------

class TestCuckooFilter:
    def test_locations_oracle(self):
        # recompute _locations from first principles, as the reference test
        # does (tests/cuckoo-filter.test.ts:6-28)
        from bloom_filters_spark.hashing import DEFAULT_SEED, xxh64

        f = CuckooFilter.create(100, 0.01)
        fp, i1, i2 = f._locations("alice")
        h = xxh64("alice", DEFAULT_SEED)
        assert fp == format(h, "x")[: f.f_length]
        assert i1 == h % f.size
        assert i2 == (h ^ xxh64(fp, DEFAULT_SEED)) % f.size

    def test_add_has_remove(self):
        f = CuckooFilter.create(100, 0.01)
        assert f.add("alice")
        assert f.add("bob")
        assert f.has("alice") and f.has("bob")
        assert f.remove("alice")
        assert not f.has("alice")
        assert f.has("bob")

    def test_fill_moderate_load(self):
        # moderate load: kicks are rare, so membership holds.  (At heavy
        # load the reference's kick relocation index — (index ^ h(fp)) %
        # size, cuckoo-filter.ts:205-210 — is not an involution of
        # _locations, so heavily-kicked fingerprints may be unfindable;
        # we replicate, not fix.)
        f = CuckooFilter.create(1000, 0.01)
        ok = sum(f.add(str(i)) for i in range(500))
        assert ok == 500
        found = sum(f.has(str(i)) for i in range(500))
        # the handful of kicked fingerprints depend on the seedrandom
        # stream; at ~48% load only a few adds kick at all
        assert found >= 495

    def test_json_roundtrip(self):
        f = CuckooFilter.create(50, 0.01)
        f.add("alice")
        g = CuckooFilter.from_json(f.save_as_json())
        assert g.has("alice")


# ---------------------------------------------------------------------------
# IBLT — reference tests/iblt.test.ts
# ---------------------------------------------------------------------------

class TestIBLT:
    def test_xor_bytes_laws(self):
        from bloom_filters_spark.sketches.iblt import xor_bytes

        a, b = b"alice", b"bob"
        assert xor_bytes(a, a) == b""
        assert xor_bytes(xor_bytes(a, b), b) == a
        assert xor_bytes(xor_bytes(a, b), a) == b

    def test_substract_decode(self):
        keys = [f"key-{i}" for i in range(200)]
        extra = [f"extra-{i}" for i in range(20)]
        miss = [f"miss-{i}" for i in range(20)]
        a = InvertibleBloomFilter.create(100)
        b = InvertibleBloomFilter.create(100)
        for k in keys + extra:
            a.add(k)
        for k in keys + miss:
            b.add(k)
        res = a.substract(b).decode()
        assert res["success"]
        assert sorted(res["additional"]) == sorted(e.encode() for e in extra)
        assert sorted(res["missing"]) == sorted(m.encode() for m in miss)

    def test_json_roundtrip(self):
        f = InvertibleBloomFilter.create(10)
        f.add("alice")
        g = InvertibleBloomFilter.from_json(f.save_as_json())
        assert g.counts == f.counts
        assert g.id_sums == f.id_sums

    def test_gen_indexes_partial_chunk_parity(self):
        """A 31-hex-char (15-byte) digest must yield a FOURTH chunk with
        OOB bytes read as 0 — the reference JS loop bound is
        ``i < digest.length / 4`` (float) and ``undefined & 0xff === 0``
        (invertible-bloom-lookup-tables.ts:194-199).  b'elem11' at salt 0
        hashes to a 31-char hex digest; reference indexes at size=100,
        hash_count=6 verified empirically."""
        from bloom_filters_spark.xxh3 import xxh3_128

        assert len(format(xxh3_128(b"elem11", 0), "x")) == 31
        f = InvertibleBloomFilter(100, 6)
        assert f._gen_indexes(b"elem11") == [0, 30, 82, 64, 13, 57]

    def test_gen_indexes_js_oracle_sweep(self):
        """Independent line-for-line transcription of the JS genIndexes
        loop (hex pairs, float loop bound, OOB-as-zero, abs∘trunc-mod)
        as oracle over many elements and configs incl. hash_count=6."""
        from bloom_filters_spark.xxh3 import xxh3_128

        def js_gen_indexes(value: bytes, hash_count: int, size: int):
            indexes = []
            salt = 0
            while len(indexes) < hash_count:
                hex_str = format(xxh3_128(value, salt), "x")
                digest = [int(hex_str[i:i + 2], 16)
                          for i in range(0, len(hex_str) - 1, 2)]
                salt += 1
                i = 0
                while i < len(digest) / 4 and len(indexes) < hash_count:
                    h = 0
                    for j in range(i * 4, i * 4 + 4):
                        h = (h << 8) & 0xFFFFFFFF
                        h |= digest[j] if j < len(digest) else 0
                    if h >= 0x80000000:
                        h -= 0x100000000
                    indexes.append(h)
                    i += 1
            return [abs(x) % size for x in indexes]

        for n in range(300):
            e = f"elem{n}".encode()
            for hc, size in [(3, 100), (6, 102), (6, 204), (4, 91)]:
                f = InvertibleBloomFilter(size, hc)
                assert f._gen_indexes(e) == js_gen_indexes(e, hc, size)

    def test_create_size_rounding_quirk(self):
        """Reference adds a FULL hash_count when ceil(alpha*d) is already
        a multiple of it (invertible-bloom-lookup-tables.ts:73-74):
        d=3, alpha=2, k=3 → size 9, not 6."""
        assert InvertibleBloomFilter.create(3, alpha=2.0, hash_count=3).size == 9
        assert InvertibleBloomFilter.create(100, alpha=2.0, hash_count=3).size == 201
        assert InvertibleBloomFilter.create(5, alpha=2.0, hash_count=6).size == 12


class TestSeedRandomParity:
    """The seedrandom replica (seedrandom_rng.py) must match the npm
    package's stream — it feeds XOR build seeds and cuckoo kicks."""

    def test_published_vector(self):
        from bloom_filters_spark.seedrandom_rng import SeedRandom

        # the seedrandom README's own example value
        assert SeedRandom("hello.").random() == 0.9282578795792454

    def test_xor_retry_chain_is_reference_chain(self):
        """xor-filter.ts:159-165: seed=0n, each retry draws one int32
        from seedrandom(str(seed)) — a universal chain starting at "0".
        The first link is pinned; a successfully-built filter's build
        seed must be ON the chain."""
        from bloom_filters_spark.seedrandom_rng import SeedRandom
        from bloom_filters_spark.sketches.xor_filter import XorFilter

        assert SeedRandom("0").int32() == -943362344
        chain, s = [], 0
        for _ in range(6):
            s = SeedRandom(str(s)).int32()
            chain.append(s)
        f = XorFilter.from_items([f"k{i}" for i in range(50)])
        assert f._build_seed in chain

    def test_xor_json_matches_reference_shape(self):
        """ExportedXorFilter (xor-filter.ts:8-14): _filter entries and
        _seed are $bf$bigint objects; _seed is the BUILD seed."""
        from bloom_filters_spark.sketches.xor_filter import XorFilter

        f = XorFilter.from_items(["a", "b", "c"])
        obj = f.to_json_obj()
        assert set(obj) == {"_size", "_bits", "_blockLength", "_filter",
                            "_seed"}
        assert obj["_seed"] == {"$bf$bigint": str(f._build_seed)}
        assert all(set(v) == {"$bf$bigint"} for v in obj["_filter"])
        g = XorFilter.from_json_obj(obj)
        assert g._build_seed == f._build_seed
        assert (g.filter == f.filter).all()
        assert g.has("a") and g.has("b") and not g.has("zz")

    def test_differential_vs_node(self):
        """Differential test against the algorithm run under Node's
        native JS semantics (ToInt32 of NaN/undefined, double
        arithmetic) — skipped where node is unavailable."""
        import json
        import shutil
        import subprocess
        from pathlib import Path

        import pytest as _pytest

        if shutil.which("node") is None:
            _pytest.skip("node not available")
        from bloom_filters_spark.seedrandom_rng import SeedRandom

        seeds = ["0", "-943362344", "78187493520", "hello.", "",
                 "x" * 300, "1234567890", "  weird  seed  "]
        js_path = Path(__file__).parent / "fixtures" / "seedrandom_check.js"
        out = json.loads(subprocess.run(
            ["node", str(js_path), json.dumps(seeds)],
            capture_output=True, text=True, check=True,
        ).stdout)
        for s in seeds:
            a, b = SeedRandom(s), SeedRandom(s)
            assert [a.int32() for _ in range(8)] == out[s]["int32"], s
            assert [b.random() for _ in range(8)] == out[s]["random"], s
