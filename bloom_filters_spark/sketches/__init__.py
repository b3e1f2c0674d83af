"""Mergeable probabilistic sketch kernels (numpy monoids).

Each sketch is a commutative monoid (Bloom = bitwise OR, CMS = elementwise
sum, HLL = elementwise max, MinHash = elementwise min) — the shape Spark's
partial+final aggregation wants.  The Spark engine builds one sketch per
partition with ``applyInPandas`` and merges at the exchange.

Semantics re-express the reference library (``/root/reference/src``);
JSON export/import is compatible with its ``saveAsJSON``/``fromJSON``
checkpoint format.
"""

from bloom_filters_spark.sketches.bloom import BloomFilter
from bloom_filters_spark.sketches.counting_bloom import CountingBloomFilter
from bloom_filters_spark.sketches.partitioned_bloom import PartitionedBloomFilter
from bloom_filters_spark.sketches.scalable_bloom import ScalableBloomFilter
from bloom_filters_spark.sketches.cms import CountMinSketch
from bloom_filters_spark.sketches.hll import HyperLogLog
from bloom_filters_spark.sketches.minhash import MinHash, MinHashFactory
from bloom_filters_spark.sketches.topk import TopK
from bloom_filters_spark.sketches.xor_filter import XorFilter
from bloom_filters_spark.sketches.cuckoo import CuckooFilter
from bloom_filters_spark.sketches.iblt import InvertibleBloomFilter

__all__ = [
    "BloomFilter",
    "CountingBloomFilter",
    "PartitionedBloomFilter",
    "ScalableBloomFilter",
    "CountMinSketch",
    "HyperLogLog",
    "MinHash",
    "MinHashFactory",
    "TopK",
    "XorFilter",
    "CuckooFilter",
    "InvertibleBloomFilter",
]
