"""Operator-level tests for the similarity / membership additions."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_mutual_nn_pairs_planted(spark):
    """Two planted tight pairs + noise vectors → exactly those pairs."""
    from bloom_filters_spark.operators.similarity import mutual_nn_pairs

    rng = np.random.default_rng(3)
    base1 = rng.standard_normal(16)
    base2 = rng.standard_normal(16)
    rows = [
        (0, (base1 + 0.01 * rng.standard_normal(16)).tolist()),
        (1, (base1 + 0.01 * rng.standard_normal(16)).tolist()),
        (2, (base2 + 0.01 * rng.standard_normal(16)).tolist()),
        (3, (base2 + 0.01 * rng.standard_normal(16)).tolist()),
    ] + [(10 + i, rng.standard_normal(16).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id1"], r["id2"]) for r in mutual_nn_pairs(df).collect()}
    assert {(0, 1), (2, 3)} <= got
    # planted pairs are cosine ~1.0; random 16-dim vectors essentially
    # never mutually rank each other first AND beat the planted pairs
    assert all(a < b for a, b in got)


def test_mutual_nn_block_matches_driver_oracle(spark):
    """The distributed block-matmul path must equal the collect-based
    oracle exactly, including across-block ties, at several block sizes
    (block_size < n forces multi-tile reduction)."""
    from bloom_filters_spark.operators.similarity import mutual_nn_pairs

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(12).tolist()) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {(r["id1"], r["id2"])
            for r in mutual_nn_pairs(df, impl="driver").collect()}
    for bs in (32, 64, 1024):
        got = {(r["id1"], r["id2"])
               for r in mutual_nn_pairs(df, block_size=bs).collect()}
        assert got == want, bs


def test_xor_filter_column_no_false_negatives(spark):
    from bloom_filters_spark.operators.sketch_agg import build_xor, xor_filter_column

    members = spark.createDataFrame(
        [(i,) for i in range(200)], "k long"
    )
    probe = spark.createDataFrame(
        [(i,) for i in range(400)], "k long"
    )
    xf = build_xor(members, "k", bits_per_fingerprint=16)
    kept = {r["k"] for r in xor_filter_column(probe, "k", xf).collect()}
    # all true members retained (xor filters have no false negatives)
    assert set(range(200)) <= kept
    # 16-bit fingerprints: expect ~200 * 2^-16 false positives ≈ 0
    assert len(kept - set(range(200))) <= 3


def test_set_reconcile_matches_except(spark):
    a = spark.createDataFrame([(i,) for i in range(10)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "k long")
    gone = a.join(b, "k", "left_anti")
    new = b.join(a, "k", "left_anti")
    assert {r["k"] for r in gone.collect()} == set(range(5))
    assert {r["k"] for r in new.collect()} == set(range(10, 15))
