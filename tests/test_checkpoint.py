"""Checkpoint/resume tests (SURVEY.md §5.2 item 5): kill-and-resume must
not recompute completed partitions and must produce identical clusters."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.checkpoint import (
    CheckpointConfig,
    CheckpointedNearDup,
    read_manifest,
)
from bloom_filters_spark.pipeline import NearDupConfig, near_dup_pipeline


@pytest.fixture()
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def clusters_dict(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_checkpointed_matches_direct(spark, docs_df, tmp_path):
    cfg = NearDupConfig(threshold=0.7)
    direct = clusters_dict(near_dup_pipeline(docs_df, cfg))
    cp = CheckpointedNearDup(spark, cfg, CheckpointConfig(str(tmp_path), n_buckets=8))
    got = clusters_dict(cp.run(docs_df))
    assert got == direct


def test_resume_skips_completed_buckets(spark, docs_df, tmp_path):
    cfg = NearDupConfig(threshold=0.7)
    root = str(tmp_path)
    cp1 = CheckpointedNearDup(spark, cfg, CheckpointConfig(root, n_buckets=8))
    first = clusters_dict(cp1.run(docs_df))

    # simulate a crash that lost buckets 2 and 5 of the signature stage
    # and everything downstream
    sig_dir = os.path.join(root, "signatures")
    man = read_manifest(sig_dir)
    for b in ("2", "5"):
        del man["buckets"][b]
        shutil.rmtree(os.path.join(sig_dir, f"bucket={b}"), ignore_errors=True)
    with open(os.path.join(sig_dir, "_manifest.json"), "w") as f:
        json.dump(man, f)
    shutil.rmtree(os.path.join(root, "pairs"))
    shutil.rmtree(os.path.join(root, "clusters"))
    for d in os.listdir(root):
        if d.startswith("labels_iter_"):
            shutil.rmtree(os.path.join(root, d))

    cp2 = CheckpointedNearDup(spark, cfg, CheckpointConfig(root, n_buckets=8))
    second = clusters_dict(cp2.run(docs_df))
    assert second == first

    sig_counter = [c for c in cp2.metrics() if c["stage"] == "signatures"][0]
    assert sig_counter["recomputed_buckets"] == 2
    assert sig_counter["skipped_buckets"] == 6


def test_full_resume_is_all_skips(spark, docs_df, tmp_path):
    cfg = NearDupConfig(threshold=0.7)
    root = str(tmp_path)
    CheckpointedNearDup(spark, cfg, CheckpointConfig(root, n_buckets=4)).run(docs_df)
    cp2 = CheckpointedNearDup(spark, cfg, CheckpointConfig(root, n_buckets=4))
    cp2.run(docs_df)
    stages = {c["stage"]: c for c in cp2.metrics()}
    assert stages["signatures"]["recomputed_buckets"] == 0
    assert stages["pairs"]["recomputed"] is False
    assert stages["clusters"]["recomputed"] is False


def test_config_change_invalidates(spark, docs_df, tmp_path):
    root = str(tmp_path)
    CheckpointedNearDup(
        spark, NearDupConfig(threshold=0.7), CheckpointConfig(root, n_buckets=4)
    ).run(docs_df)
    cfg2 = NearDupConfig(threshold=0.8)
    cp2 = CheckpointedNearDup(spark, cfg2, CheckpointConfig(root, n_buckets=4))
    got = clusters_dict(cp2.run(docs_df))
    sig_counter = [c for c in cp2.metrics() if c["stage"] == "signatures"][0]
    assert sig_counter["recomputed_buckets"] == 4
    assert got == clusters_dict(near_dup_pipeline(docs_df, cfg2))


def test_table_format_seam_generic_branch(spark, docs_df, tmp_path):
    """The non-parquet storage branch (format(...).save/load) must
    produce identical clusters and resume behavior — exercised with ORC
    (bundled with Spark) standing in for Iceberg, which needs a runtime
    jar this sandbox lacks."""
    cfg = NearDupConfig(threshold=0.7)
    root = str(tmp_path)
    ck = CheckpointConfig(root, n_buckets=4, table_format="orc")
    got = clusters_dict(CheckpointedNearDup(spark, cfg, ck).run(docs_df))
    assert got == clusters_dict(near_dup_pipeline(docs_df, cfg))
    # resume: second run skips every stage
    cp2 = CheckpointedNearDup(spark, cfg, CheckpointConfig(root, n_buckets=4,
                                                           table_format="orc"))
    cp2.run(docs_df)
    stages = {c["stage"]: c for c in cp2.metrics()}
    assert stages["signatures"]["recomputed_buckets"] == 0
    assert stages["pairs"]["recomputed"] is False


def test_table_format_resolves_from_session_conf(spark, docs_df, tmp_path):
    """table_format=None must resolve from the session conf key — the
    one-flag cluster deployment path (--conf ...checkpoint.format=iceberg
    flips every checkpoint table with zero code changes)."""
    from bloom_filters_spark.checkpoint import FORMAT_CONF_KEY

    root = str(tmp_path)
    spark.conf.set(FORMAT_CONF_KEY, "orc")
    try:
        cp = CheckpointedNearDup(
            spark, NearDupConfig(threshold=0.7), CheckpointConfig(root, n_buckets=4)
        )
        assert cp.table_format == "orc"
        got = clusters_dict(cp.run(docs_df))
    finally:
        spark.conf.unset(FORMAT_CONF_KEY)
    assert got == clusters_dict(
        near_dup_pipeline(docs_df, NearDupConfig(threshold=0.7))
    )
    # the stage tables were actually written as ORC, not parquet
    sig_dir = os.path.join(root, "signatures")
    bucket0 = [d for d in os.listdir(sig_dir) if d.startswith("bucket=")][0]
    files = os.listdir(os.path.join(sig_dir, bucket0))
    assert any(f.endswith(".orc") for f in files), files
    assert not any(f.endswith(".parquet") for f in files), files
    # default (no conf, no explicit format) stays parquet
    cp2 = CheckpointedNearDup(
        spark, NearDupConfig(threshold=0.7),
        CheckpointConfig(str(tmp_path) + "_p", n_buckets=4),
    )
    assert cp2.table_format == "parquet"
