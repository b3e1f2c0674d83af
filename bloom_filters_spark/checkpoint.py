"""Per-partition checkpoint / resume for the dedup pipeline.

North-rule requirement: every stage checkpoints per-partition state with
lineage + counters so a killed job resumes without recomputing completed
partitions.

Layout (parquet locally; the same protocol targets Iceberg tables on a
cluster — partitionBy(bucket) maps to a partitioned Iceberg table and
the manifest to a snapshot/metadata table):

    <root>/signatures/bucket=<i>/*.parquet   per-bucket signature state
    <root>/signatures/_manifest.json         completed buckets + lineage
    <root>/pairs/*.parquet, _manifest.json   verified pairs
    <root>/labels_iter_<k>/, _manifest.json  label-prop iterations
    <root>/clusters/*.parquet, _manifest.json

Resume semantics:
* signatures: bucket b = pmod(xxhash64(doc_id), n_buckets); only buckets
  missing from the manifest are recomputed (anti-join by bucket id);
  dynamic partition overwrite keeps completed buckets untouched.
* pairs: all-or-nothing stage (skipped when its manifest exists).
* label propagation: resumes from the last completed iteration.

Each manifest carries lineage: stage, config fingerprint, per-bucket row
counts and wall_ms.  A config change invalidates the checkpoint (the
fingerprint no longer matches → stage recomputes from scratch).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_filters_spark.operators.pairs import candidate_pairs
from bloom_filters_spark.pipeline import (
    NearDupConfig,
    lsh_bands,
    signatures,
    verified_pairs,
)


#: spark.conf key that sets the default checkpoint table format for
#: every CheckpointedNearDup run in the session.
FORMAT_CONF_KEY = "spark.bloomFiltersSpark.checkpoint.format"


@dataclass
class CheckpointConfig:
    root: str
    n_buckets: int = 32
    # storage format for every stage table: "parquet" (works anywhere)
    # or any DataSource name on the classpath — "iceberg" (path-based
    # hadoop-catalog tables on a cluster with the Iceberg runtime; same
    # protocol, snapshot metadata replaces the _manifest.json sidecar
    # role for readers, though the manifest is still written for resume
    # logic), "orc", etc.  None (default) resolves from the session conf
    # FORMAT_CONF_KEY, falling back to parquet — so a cluster deployment
    # flips every checkpoint to Iceberg with one --conf and zero code
    # changes.  The sandbox has no Iceberg jar; the dispatch itself is
    # unit-tested end-to-end through the built-in orc source.
    table_format: str | None = None


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_manifest.json")


def read_manifest(stage_dir: str) -> dict | None:
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_manifest(stage_dir: str, payload: dict):
    os.makedirs(stage_dir, exist_ok=True)
    tmp = _manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(stage_dir))  # atomic publish


def config_fingerprint(cfg: NearDupConfig) -> str:
    import hashlib

    return hashlib.md5(
        json.dumps(asdict(cfg), sort_keys=True).encode()
    ).hexdigest()


class CheckpointedNearDup:
    """Resumable near-dup pipeline.  ``run()`` is idempotent: re-running
    after a crash recomputes only incomplete work."""

    def __init__(self, spark: SparkSession, cfg: NearDupConfig, ckpt: CheckpointConfig):
        self.spark = spark
        self.cfg = cfg
        self.ckpt = ckpt
        self.table_format = (
            ckpt.table_format
            if ckpt.table_format is not None
            else spark.conf.get(FORMAT_CONF_KEY, "parquet")
        )
        self.fingerprint = config_fingerprint(cfg)
        self.counters: list[dict] = []

    # -- storage seam (parquet | iceberg | any DataSource) ------------------
    def _write(self, df: DataFrame, path: str, partition_by: str | None = None):
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        if self.table_format == "parquet":
            w.parquet(path)
        else:
            w.format(self.table_format).save(path)

    def _read(self, path: str) -> DataFrame:
        if self.table_format == "parquet":
            return self.spark.read.parquet(path)
        return self.spark.read.format(self.table_format).load(path)

    # -- stage 1: bucketed signatures -------------------------------------
    def _sig_dir(self) -> str:
        return os.path.join(self.ckpt.root, "signatures")

    def signatures_stage(self, df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
        sig_dir = self._sig_dir()
        man = read_manifest(sig_dir)
        # bucket assignment is pmod(hash, n_buckets), so a manifest
        # written under a different n_buckets describes DIFFERENT
        # buckets — resuming against it would duplicate or stale rows
        done: dict[str, dict] = (
            man["buckets"]
            if man
            and man.get("fingerprint") == self.fingerprint
            and man.get("n_buckets") == self.ckpt.n_buckets
            else {}
        )
        all_buckets = set(range(self.ckpt.n_buckets))
        missing = sorted(all_buckets - {int(b) for b in done})
        if missing:
            t0 = time.time()
            if not done and os.path.exists(sig_dir):
                # fresh start over an existing dir (config/n_buckets
                # changed): dynamic partition overwrite only replaces
                # partitions this run writes, so stale old-config
                # bucket dirs would survive and feed _read() — clear
                # the stage wholesale first
                import shutil

                shutil.rmtree(sig_dir)
            bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(self.ckpt.n_buckets))
            todo = df.withColumn("bucket", bucket).filter(
                F.col("bucket").isin(missing)
            )
            # bucket is a pure function of the id column: attach it
            # with the same expression instead of re-scanning df
            # through a join
            sigs = signatures(todo, self.cfg, id_col, text_col).withColumn(
                "bucket", bucket
            )
            overwrite_key = "spark.sql.sources.partitionOverwriteMode"
            try:
                prev_mode = self.spark.conf.get(overwrite_key)
            except Exception:
                prev_mode = None
            self.spark.conf.set(overwrite_key, "dynamic")
            try:
                self._write(
                    sigs.repartition(len(missing), "bucket"),
                    sig_dir,
                    partition_by="bucket",
                )
            finally:
                if prev_mode is None:
                    self.spark.conf.unset(overwrite_key)
                else:
                    self.spark.conf.set(overwrite_key, prev_mode)
            wall_ms = int((time.time() - t0) * 1000)
            # per-bucket lineage from the just-written files
            counts = (
                self._read(sig_dir)
                .filter(F.col("bucket").isin(missing))
                .groupBy("bucket")
                .count()
                .collect()
            )
            for r in counts:
                done[str(r["bucket"])] = {
                    "rows": r["count"],
                    "wall_ms": wall_ms // max(len(missing), 1),
                }
            # buckets with zero output rows still count as completed
            for b in missing:
                done.setdefault(str(b), {"rows": 0, "wall_ms": 0})
            write_manifest(
                sig_dir,
                {
                    "stage": "signatures",
                    "fingerprint": self.fingerprint,
                    "n_buckets": self.ckpt.n_buckets,
                    "buckets": done,
                },
            )
        self.counters.append(
            {"stage": "signatures", "recomputed_buckets": len(missing),
             "skipped_buckets": self.ckpt.n_buckets - len(missing)}
        )
        return self._read(sig_dir).drop("bucket")

    # -- stage 2: candidate + verified pairs --------------------------------
    def pairs_stage(self, sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
        pair_dir = os.path.join(self.ckpt.root, "pairs")
        man = read_manifest(pair_dir)
        if man is None or man.get("fingerprint") != self.fingerprint:
            t0 = time.time()
            cands = candidate_pairs(
                lsh_bands(sigs, self.cfg, id_col), self.cfg.max_band_group, id_col
            )
            pairs = verified_pairs(cands, sigs, self.cfg, id_col)
            self._write(pairs, pair_dir)
            n = self._read(pair_dir).count()
            write_manifest(
                pair_dir,
                {
                    "stage": "pairs",
                    "fingerprint": self.fingerprint,
                    "rows": n,
                    "wall_ms": int((time.time() - t0) * 1000),
                },
            )
            self.counters.append({"stage": "pairs", "recomputed": True, "rows": n})
        else:
            self.counters.append(
                {"stage": "pairs", "recomputed": False, "rows": man["rows"]}
            )
        return self._read(pair_dir)

    # -- stage 3: label propagation with per-iteration checkpoints ----------
    def clusters_stage(self, pairs: DataFrame, vertices: DataFrame,
                       id_col: str = "doc_id", max_iter: int = 20) -> DataFrame:
        root = self.ckpt.root
        out_dir = os.path.join(root, "clusters")
        man = read_manifest(out_dir)
        if man is not None and man.get("fingerprint") == self.fingerprint:
            self.counters.append({"stage": "clusters", "recomputed": False})
            return self._read(out_dir)

        sym = pairs.select(
            F.col("id1").alias("src"), F.col("id2").alias("dst")
        ).unionByName(
            pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        ).dropDuplicates(["src", "dst"])

        # resume from the last completed iteration checkpoint
        start_iter = 0
        labels = None
        for k in range(max_iter, 0, -1):
            it_dir = os.path.join(root, f"labels_iter_{k}")
            m = read_manifest(it_dir)
            if m is not None and m.get("fingerprint") == self.fingerprint:
                labels = self._read(it_dir)
                start_iter = k
                if m.get("converged"):
                    start_iter = max_iter  # nothing left to do
                break
        if labels is None:
            labels = (
                sym.select(F.col("src").alias(id_col))
                .distinct()
                .withColumn("label", F.col(id_col))
            )

        it = start_iter
        converged = False
        while it < max_iter and not converged:
            it += 1
            t0 = time.time()
            msgs = (
                sym.join(labels, sym.src == labels[id_col])
                .groupBy(F.col("dst").alias(id_col))
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = labels.join(msgs, id_col, "left").select(
                id_col,
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            # pointer jumping (label := label of label), same as
            # components._components_labelprop: doubles the effective
            # hop distance per iteration so chain-shaped components
            # converge in O(log diameter) checkpointed iterations
            jump = stepped.select(
                F.col(id_col).alias("_jid"), F.col("label").alias("_jlabel")
            )
            stepped = (
                stepped.join(jump, stepped["label"] == jump["_jid"], "left")
                .select(
                    id_col,
                    "old_label",
                    F.least(
                        F.col("label"), F.coalesce("_jlabel", "label")
                    ).alias("label"),
                )
            )
            it_dir = os.path.join(root, f"labels_iter_{it}")
            self._write(stepped, it_dir)
            stepped = self._read(it_dir)
            changed = stepped.filter(F.col("label") < F.col("old_label")).count()
            converged = changed == 0
            write_manifest(
                it_dir,
                {
                    "stage": f"labels_iter_{it}",
                    "fingerprint": self.fingerprint,
                    "changed": changed,
                    "converged": converged,
                    "wall_ms": int((time.time() - t0) * 1000),
                },
            )
            labels = stepped.select(id_col, "label")
            self.counters.append(
                {"stage": "labels", "iteration": it, "changed": changed}
            )

        if not converged and it >= max_iter and start_iter < max_iter:
            # same contract as components._components_labelprop: never
            # checkpoint a silently-split clustering — the manifest
            # guard would make the wrong result sticky across runs
            import warnings

            warnings.warn(
                f"label propagation did not converge in {max_iter} "
                f"iterations ({changed} labels still changing); "
                "clusters may be split — raise max_iter",
                RuntimeWarning,
            )

        out = (
            vertices.select(id_col)
            .join(labels.select(id_col, F.col("label").alias("cluster_id")),
                  id_col, "left")
            .select(
                id_col,
                F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            )
        )
        self._write(out, out_dir)
        write_manifest(
            out_dir,
            {"stage": "clusters", "fingerprint": self.fingerprint,
             "iterations": it},
        )
        return self._read(out_dir)

    # -- full run ------------------------------------------------------------
    def run(self, df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
        sigs = self.signatures_stage(df, id_col, text_col)
        pairs = self.pairs_stage(sigs, id_col)
        return self.clusters_stage(pairs, df.select(id_col), id_col)

    def metrics(self) -> list[dict]:
        return list(self.counters)
