"""Distributed sketch aggregation: partition-local build → monoid merge.

This is the reference's ``merge`` law (SURVEY.md §0) mapped onto Spark's
partial+final aggregation: ``mapInPandas`` builds one sketch per input
partition (vectorized adds over Arrow batches), the driver (or a
``groupBy`` for keyed variants) merges the handful of partition sketches.
Sketch state rides as JSON bytes — the reference's ``saveAsJSON``
checkpoint format — so partials are themselves checkpointable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    TopK,
)


def _col_values(pdf: pd.DataFrame, col: str) -> list:
    return [v for v in pdf[col].tolist() if v is not None]


def _partition_sketches(df: DataFrame, col: str, make, add_batch):
    """mapInPandas: one sketch per partition → rows of sketch JSON bytes."""

    def build(batches):
        sketch = None
        for pdf in batches:
            vals = _col_values(pdf, col)
            if not vals:
                continue
            if sketch is None:
                sketch = make()
            add_batch(sketch, vals)
        if sketch is not None:
            yield pd.DataFrame({"sketch": [sketch.to_bytes()]})

    return df.select(col).mapInPandas(build, "sketch binary")


def _merge_partials(partials: DataFrame, cls):
    rows = partials.collect()
    if not rows:
        return None
    merged = cls.from_bytes(rows[0]["sketch"])
    for r in rows[1:]:
        merged = merged.merge(cls.from_bytes(r["sketch"]))
    return merged


def build_bloom(df: DataFrame, col: str, capacity: int, error_rate: float,
                seed: int = DEFAULT_SEED) -> BloomFilter:
    """Distributed Bloom build: per-partition bitsets OR-merged."""
    partials = _partition_sketches(
        df,
        col,
        lambda: BloomFilter.create(capacity, error_rate, seed),
        lambda s, vals: s.add_batch([str(v) for v in vals]),
    )
    out = _merge_partials(partials, BloomFilter)
    return out if out is not None else BloomFilter.create(capacity, error_rate, seed)


def bloom_filter_column(df: DataFrame, col: str, bloom: BloomFilter,
                        keep: bool = True) -> DataFrame:
    """Membership pre-filter: keep rows whose ``col`` might be in the
    Bloom filter (no false negatives; FPs expected — follow with an
    exact join when exactness matters).  The filter bytes broadcast in
    the UDF closure."""
    blob = bloom.to_bytes()

    def prune(batches):
        sk = BloomFilter.from_bytes(blob)
        for pdf in batches:
            mask = sk.has_batch([str(v) for v in pdf[col].tolist()])
            yield pdf[mask] if keep else pdf[~mask]

    return df.mapInPandas(prune, df.schema)


def build_xor(df: DataFrame, col: str, bits_per_fingerprint: int = 8,
              seed: int = DEFAULT_SEED):
    """XOR-filter build over the DISTINCT values of a column.

    The peeling construction is inherently sequential
    (/root/reference/src/bloom/xor-filter.ts:157-235), so the build runs
    on the driver over the collected distinct key set — XOR filters are
    for *static, modest-cardinality* deny/seen lists (their win is probe
    speed + size, not build parallelism).  The distinct() dedup itself
    is distributed.
    """
    from bloom_filters_spark.sketches.xor_filter import XorFilter

    values = [str(r[0]) for r in df.select(col).distinct().collect()]
    return XorFilter.from_items(values, bits_per_fingerprint, seed=seed)


def xor_filter_column(df: DataFrame, col: str, xf, keep: bool = True) -> DataFrame:
    """Membership pre-filter against a broadcast XOR filter (no false
    negatives for the built set; ~2^-bits FP rate — follow with an exact
    join when exactness matters)."""
    from bloom_filters_spark.sketches.xor_filter import XorFilter

    blob = xf.save_as_json()

    def prune(batches):
        sk = XorFilter.from_json(blob)
        for pdf in batches:
            mask = sk.has_batch([str(v) for v in pdf[col].tolist()])
            yield pdf[mask] if keep else pdf[~mask]

    return df.mapInPandas(prune, df.schema)


def hll_distinct(df: DataFrame, col: str, m: int = 4096,
                 seed: int = DEFAULT_SEED) -> float:
    """Distributed HLL cardinality estimate (register-max merge)."""
    partials = _partition_sketches(
        df,
        col,
        lambda: HyperLogLog(m, seed),
        lambda s, vals: s.update_batch([str(v) for v in vals]),
    )
    merged = _merge_partials(partials, HyperLogLog)
    return merged.count() if merged is not None else 0.0


def build_cms(df: DataFrame, col: str, error_rate: float = 1e-4,
              accuracy: float = 0.999, seed: int = DEFAULT_SEED) -> CountMinSketch:
    """Distributed CMS build (elementwise matrix-sum merge)."""
    partials = _partition_sketches(
        df,
        col,
        lambda: CountMinSketch.create(error_rate, accuracy, seed),
        lambda s, vals: s.update_batch([str(v) for v in vals]),
    )
    out = _merge_partials(partials, CountMinSketch)
    return out if out is not None else CountMinSketch.create(error_rate, accuracy, seed)


def cms_counts(spark: SparkSession, cms: CountMinSketch, keys: list[str]) -> DataFrame:
    """Point-query a merged CMS for a list of keys → DataFrame."""
    est = cms.count_batch(keys)
    return spark.createDataFrame(
        [(k, int(v)) for k, v in zip(keys, est.tolist())],
        "key string, est_count long",
    )


def topk_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """The engine's exact batch top-k (SURVEY.md §2.4 TopK row):
    groupBy().count() + deterministic ORDER BY count DESC, value ASC
    LIMIT k — Spark plans partial+final hash agg and
    TakeOrderedAndProject; one shuffle."""
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("value"))
        .limit(k)
        .select(
            "value",
            "frequency",
            F.row_number()
            .over(Window.orderBy(F.desc("frequency"), F.asc("value")))
            .alias("rank"),
        )
    )


def topk_sketch(df: DataFrame, col: str, k: int, error_rate: float = 1e-3,
                accuracy: float = 0.999, seed: int = DEFAULT_SEED) -> TopK:
    """Sketch-parity top-k: merged distributed CMS + driver-side heap
    replay over the distinct keys (reference TopK.add semantics with
    batched counts, tests/topk.test.ts:31-89)."""
    cms = build_cms(df, col, error_rate, accuracy, seed)
    t = TopK(k, error_rate, accuracy, seed)
    t.sketch = cms
    # replay: feed each distinct key once with its estimated frequency —
    # equivalent to reference batched adds (count path hits the same CMS)
    keys = [r["value"] for r in
            df.select(F.col(col).alias("value")).distinct().collect()]
    for key in sorted(keys):  # deterministic tie-break order
        freq = cms.count(str(key))
        if len(t.heap) < k or freq >= t.heap[0][0]:
            for i, (_, v) in enumerate(t.heap):
                if v == key:
                    del t.heap[i]
                    break
            import bisect

            bisect.insort_left(t.heap, [freq, key], key=lambda e: e[0])
            if len(t.heap) > k:
                t.heap.pop(0)
    return t
