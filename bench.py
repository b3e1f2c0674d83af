"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

The flagship metric also reports dedup throughput (docs/sec) for the
near-dup pipeline over the documents table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "near_dup_clusters",
    "pages_near_dup_urls",
    "near_dup_pairs_exact",
    "incremental_near_dup",
    "dedup_keep_best",
    "dedup_exact",
    "doc_fingerprints",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "substring_dup_pairs",
    "substring_lcs",
    "token_counts",
    "text_quality",
    "lang_id",
    "repetition_stats",
    "paragraph_dup_stats",
    "paragraph_dedup_clean",
    "pii_scrub",
    "decontamination",
    "url_canonical_dups",
    "pages_canonical_clusters",
    "top_event_types",
    "topk_sketch_events",
    "cms_event_counts",
    "hll_distinct_users",
    "distinct_users_exact",
    "bloom_prune_semijoin",
    "cuckoo_prune_semijoin",
    "counting_bloom_retract",
    "partitioned_bloom_prune",
    "scalable_bloom_new_customers",
    "q1_pricing_summary",
    "q3_top_orders",
    "top_suppliers_per_nation",
    "embedding_cosine_topk",
    "embedding_ann_lsh",
    "embedding_ann_recall",
    "embedding_ann_ivf",
    "embedding_ivf_recall",
    "embedding_mutual_nn",
    "xor_membership",
    "set_reconcile_customers",
    "media_image_features",
    "media_phash_dups",
    "stratified_sample",
    "hash_sample",
    "domain_cap",
    "token_budget_select",
    "gopher_quality_flags",
    "hash_split",
    "rare_trigram_score",
    "latest_revision",
    "domain_blocklist",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from bloom_filters_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    # warm up JVM + Python workers once so the first measured query isn't
    # paying session bootstrap (sandbox worker spawn is slow).  The
    # mapInArrow no-op spawns the Arrow Python worker pool; the tiny
    # near-dup run makes every reused worker import the kernel modules
    # (numpy + bloom_filters_spark) and JIT-warms the band/pair path —
    # without it the first measured query absorbs ~7s of per-worker
    # import cost that is bootstrap, not query time (steady-state per-
    # query times are what the 800k-doc scaling bench also reports).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(0, 10000, 1, cpus).mapInArrow(
        lambda it: it, "id long"
    ).selectExpr("count(1)").collect()
    from bloom_filters_spark.pipeline import NearDupConfig, near_dup_pipeline

    warm = spark.createDataFrame(
        [(i, " ".join(f"w{i + j}" for j in range(12))) for i in range(256)],
        "doc_id long, text string",
    ).repartition(cpus)
    near_dup_pipeline(warm, NearDupConfig(threshold=0.9)).count()

    qs = entrymod.queries()
    # HEADLINE fixes the ordering of the long-lived queries (stable
    # cross-round comparisons); anything newer in queries() runs after
    # it so the bench can never silently miss a query again
    order = [n for n in HEADLINE if n in qs] + sorted(
        n for n in qs if n not in HEADLINE
    )
    timings = {}
    for name in order:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    dedup_docs_per_sec = (
        round(n_docs / timings["near_dup_clusters"], 1)
        if timings.get("near_dup_clusters")
        else None
    )
    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "dedup_docs_per_sec": dedup_docs_per_sec,
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
