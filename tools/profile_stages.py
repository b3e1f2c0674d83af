"""Per-stage wall-time profile of the near-dup pipeline at one
parallelism level.  Usage: python tools/profile_stages.py <cores> [n_docs]

Each stage is timed by materializing just that stage's output (count),
with upstream stages persisted so later timings don't re-pay them.
Run twice in-process; the second (warm) run is the reported one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bloom_filters_spark.session import get_spark
from bloom_filters_spark.operators.components import connected_components
from bloom_filters_spark.operators.pairs import candidate_pairs
from bloom_filters_spark.pipeline import (
    NearDupConfig,
    lsh_bands,
    signatures,
    verified_pairs,
)

CORPUS = "/tmp/spark_graft_scaling_corpus"


def ensure_corpus(spark, n_docs: int):
    marker = f"{CORPUS}/_n{n_docs}"
    if os.path.exists(marker):
        return
    from bloom_filters_spark.sources.pages import pages_table

    pages_table(spark, n_docs, seed=11).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(CORPUS)
    open(marker, "w").close()


def profile_once(spark, cfg):
    """Mirrors the FUSED default path of near_dup_pipeline stage by
    stage (text→band rows, candidates, participant signatures, verify,
    components)."""
    from pyspark.sql import functions as F

    from bloom_filters_spark.operators.arrow_sig import (
        fused_band_rows,
        signatures_arrow,
    )

    docs = spark.read.parquet(CORPUS)
    t = {}
    t0 = time.time()
    bands = fused_band_rows(
        docs, cfg.factory(), cfg.bands, cfg.rows_per_band,
        cfg.shingle_size, cfg.max_value,
    )
    cands = candidate_pairs(bands, cfg.max_band_group).persist()
    n_cands = cands.count()
    t["bands+candidates"] = time.time() - t0

    t0 = time.time()
    ids = (
        cands.select(F.col("id1").alias("doc_id"))
        .unionByName(cands.select(F.col("id2").alias("doc_id")))
        .distinct()
    )
    sigs = signatures_arrow(
        docs.join(F.broadcast(ids), "doc_id", "left_semi"), cfg.factory(),
        shingle_size=cfg.shingle_size, max_value=cfg.max_value,
    ).persist()
    n_sigs = sigs.count()
    t["participant_signatures"] = time.time() - t0

    t0 = time.time()
    pairs = verified_pairs(cands, sigs, cfg).persist()
    n_pairs = pairs.count()
    t["verify"] = time.time() - t0

    t0 = time.time()
    clusters = connected_components(
        pairs, vertices=docs.select("doc_id"), n_edges=n_pairs
    )
    n_clusters = clusters.count()
    t["components"] = time.time() - t0

    t["total"] = sum(t.values())
    counts = {"sigs": n_sigs, "cands": n_cands, "pairs": n_pairs,
              "cluster_rows": n_clusters}
    for df in (sigs, cands, pairs):
        df.unpersist()
    return t, counts


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(
        f"profile-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": "1048576"},
    )
    ensure_corpus(spark, n_docs)
    cfg = NearDupConfig(threshold=0.8)
    cold, counts = profile_once(spark, cfg)
    warm, _ = profile_once(spark, cfg)
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "counts": counts,
        "cold": {k: round(v, 2) for k, v in cold.items()},
        "warm": {k: round(v, 2) for k, v in warm.items()},
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
