"""spark-submit entry point for the end-to-end training-data curation
pipeline: quality filter → C4 structural gate → dedup → domain cap →
DSIR target-matching selection → language rebalance → token-budget
selection → train/val/test split.

Every stage is optional and composable; each is one of the engine's
tested operators (functions/text.py, operators/sampling.py,
operators/dedup.py, pipeline.py), each md5-ordered stage gets its own
salt (see operators/sampling.py on composed-selection bias), and every
stage's surviving row count lands in the metrics JSON — drops are
observable, never silent.

    python tools/package.py          # -> build/bloom_filters_spark.zip
    spark-submit --master <cluster> \
        --py-files build/bloom_filters_spark.zip \
        jobs/curate_job.py \
        --input  /path/to/docs.parquet \
        --output /path/to/curated \
        [--quality-filter] [--c4-filter] [--max-rare-ppm 500000] \
        [--dedup exact|near] [--threshold 0.8] \
        [--dsir-top N --dsir-target "lang = 'en'"] \
        [--pages --domain-cap K] \
        [--stratify-col lang --stratify-budget N --alpha 0.5] \
        [--token-budget-frac 0.5] \
        [--split train=0.98,val=0.01,test=0.01]

Writes the curated table to ``--output`` (with a ``split`` column when
--split is given) and a one-line JSON metrics summary to
``<output>_metrics.json``.
"""

from __future__ import annotations

import argparse
import json
import time


def _parse_split(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        label, _, frac = part.partition("=")
        if not label or not frac:
            raise ValueError(
                f"bad --split entry {part!r}; expected label=fraction"
            )
        out[label.strip()] = float(frac)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--pages", action="store_true",
                   help="input is a pages(url, ..., text) table; the id "
                        "key becomes url and --domain-cap is allowed")
    p.add_argument("--latest-revision", action="store_true",
                   help="with --pages: before anything else, keep only "
                        "the newest crawl (max warc_ts, max url tie) of "
                        "each canonical URL")
    p.add_argument("--blocklist", default=None,
                   help="with --pages: comma-separated blocked domains "
                        "(subdomains match); applied right after "
                        "--latest-revision")
    p.add_argument("--c4-filter", action="store_true",
                   help="C4 structural gate: drop docs with lorem "
                        "ipsum / braces / too few sentences over "
                        "C4-kept lines")
    p.add_argument("--dsir-top", type=int, default=None,
                   help="keep the N docs whose hashed-n-gram mix best "
                        "matches --dsir-target (DSIR importance head)")
    p.add_argument("--dsir-target", default="true",
                   help="SQL boolean over input columns marking the "
                        "target slice, e.g. \"lang = 'en'\"")
    p.add_argument("--quality-filter", action="store_true",
                   help="Gopher-style composite gates (default thresholds)")
    p.add_argument("--dedup", choices=["off", "exact", "near"],
                   default="off",
                   help="exact: keep min-id per normalized fingerprint; "
                        "near: MinHash-LSH clusters, keep the longest "
                        "member per cluster")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="near-dup Jaccard threshold (--dedup near)")
    p.add_argument("--domain-cap", type=int, default=None)
    p.add_argument("--stratify-col", default=None,
                   help="rebalance strata of this column (e.g. lang)")
    p.add_argument("--stratify-budget", type=int, default=None)
    p.add_argument("--stratify-fraction", type=float, default=None)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="temperature for --stratify-budget (0.5 = sqrt)")
    p.add_argument("--presample-margin", type=float, default=1.3,
                   help="mega-stratum prefilter margin for the exact "
                        "stratified sampler (identical output)")
    p.add_argument("--max-rare-ppm", type=int, default=None,
                   help="drop docs whose rare-trigram fraction exceeds "
                        "this ppm (corpus-relative gibberish gate)")
    p.add_argument("--rarity-shuffle-join", action="store_true",
                   help="with --max-rare-ppm: join corpus trigram "
                        "counts with a shuffle instead of a broadcast "
                        "(needed when the trigram vocabulary is huge, "
                        "e.g. CJK web corpora)")
    p.add_argument("--token-budget-frac", type=float, default=None,
                   help="keep the best-quality-bucket-first prefix "
                        "holding this fraction of total tokens")
    p.add_argument("--split", default=None,
                   help="comma list label=fraction (must sum to 1); "
                        "adds a deterministic md5-range split column")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("curate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    if args.domain_cap is not None and not args.pages:
        p.error("--domain-cap requires --pages")
    if args.latest_revision and not args.pages:
        p.error("--latest-revision requires --pages (url+warc_ts input)")
    if args.blocklist and not args.pages:
        p.error("--blocklist requires --pages (url-keyed input)")
    if args.stratify_col and not (
        (args.stratify_budget is None) ^ (args.stratify_fraction is None)
    ):
        p.error("--stratify-col needs exactly one of --stratify-budget "
                "/ --stratify-fraction")
    split = _parse_split(args.split) if args.split else None

    key_col = "url" if args.pages else args.id_col
    df = spark.read.parquet(args.input)
    t0 = time.time()
    stages = {"rows_in": df.count()}

    from bloom_filters_spark import curation as cur

    # Each stage persists its output before the count and unpersists
    # its input: without this, every stages[...] count (and the final
    # write) re-executes ALL prior stages from the parquet scan —
    # O(stages**2) work at scale.
    prev = [None]

    def _advance(new_df, stage_key):
        new_df = new_df.persist()
        stages[stage_key] = new_df.count()
        if prev[0] is not None:
            prev[0].unpersist()
        prev[0] = new_df
        return new_df

    if args.latest_revision:
        from bloom_filters_spark.operators.dedup import keep_latest_revision

        winners = keep_latest_revision(
            df, url_col="url", ts_col="warc_ts", id_col="url"
        ).select(
            F.col("kept_id").alias("_w_url"),
            F.col("kept_ts").alias("_w_ts"),
        )
        # semi-join on (url, ts): url alone would also keep OLDER rows
        # that share the winner's exact raw url string.  NULL-SAFE
        # equality on the ts key: with plain `=`, a canonical-URL group
        # whose winning row has NULL warc_ts would be dropped WHOLE
        # (NULL = NULL is NULL).  Rows that tie the winner exactly on
        # (url, ts) all survive — "latest revision" is genuinely
        # ambiguous between byte-identical (url, ts) recrawls, and
        # keeping both leaves the choice to the downstream exact dedup.
        cond = F.col("url").eqNullSafe(F.col("_w_url")) & F.col(
            "warc_ts"
        ).eqNullSafe(F.col("_w_ts"))
        df = _advance(
            df.join(winners, cond, "left_semi"),
            "after_latest_revision",
        )

    if args.blocklist:
        df = _advance(
            cur.blocklist_filter(
                df, [b.strip() for b in args.blocklist.split(",") if b.strip()]
            ),
            "after_blocklist",
        )

    if args.quality_filter:
        df = _advance(
            cur.quality_filter(df, text_col=args.text_col), "after_quality"
        )

    if args.c4_filter:
        df = _advance(
            cur.c4_filter(df, text_col=args.text_col), "after_c4"
        )

    if args.max_rare_ppm is not None:
        df = _advance(
            cur.rarity_filter(
                df, args.max_rare_ppm, key_col=key_col,
                text_col=args.text_col,
                broadcast_vocab=not args.rarity_shuffle_join,
            ),
            "after_rarity",
        )

    if args.dedup == "exact":
        df = _advance(
            cur.exact_dedup_keep_min(
                df, key_col=key_col, text_col=args.text_col
            ),
            "after_exact_dedup",
        )
    elif args.dedup == "near":
        from pyspark.sql import Window

        from bloom_filters_spark.pipeline import (
            NearDupConfig,
            near_dup_pipeline,
        )

        cfg = NearDupConfig(threshold=args.threshold)
        clusters = near_dup_pipeline(
            df, cfg, id_col=key_col, text_col=args.text_col
        )
        # keep-best: longest member per cluster, min-key tiebreak
        sized = clusters.join(
            df.select(
                F.col(key_col),
                F.length(F.col(args.text_col)).alias("_len"),
            ),
            key_col,
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("_len"), F.asc(key_col)
        )
        keep = (
            sized.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(key_col)
        )
        df = _advance(df.join(keep, key_col, "left_semi"),
                      "after_near_dedup")

    if args.domain_cap is not None:
        df = _advance(
            cur.domain_cap(df, args.domain_cap, key_col=key_col),
            "after_domain_cap",
        )

    if args.dsir_top is not None:
        df = _advance(
            cur.dsir_top_select(
                df, args.dsir_target, args.dsir_top,
                key_col=key_col, text_col=args.text_col,
            ),
            "after_dsir",
        )

    if args.stratify_col:
        from bloom_filters_spark.operators.sampling import stratified_sample

        df = _advance(
            stratified_sample(
                df, args.stratify_col, key_col=key_col,
                fraction=args.stratify_fraction,
                budget=args.stratify_budget, alpha=args.alpha,
                salt=cur.SALT_STRATIFY,
                presample_margin=args.presample_margin,
            ),
            "after_stratify",
        )

    if args.token_budget_frac is not None:
        from bloom_filters_spark.functions.text import (
            STOPWORDS,
            token_count_expr,
        )
        from bloom_filters_spark.operators.sampling import (
            token_budget_select,
        )

        text = F.col(args.text_col)
        toks = F.filter(
            F.split(F.lower(text), r"\s+"), lambda x: x != F.lit("")
        )
        sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        df = (
            df.withColumn("_tok", token_count_expr(text))
            .withColumn(
                "_score",
                F.floor(
                    (n_sw * F.lit(100.0))
                    / F.greatest(F.col("_tok"), F.lit(1))
                ),
            )
        )
        df = _advance(
            token_budget_select(
                df, "_score", "_tok", key_col=key_col,
                budget_frac=args.token_budget_frac,
                salt=cur.SALT_TOKEN_BUDGET,
            ).drop("_tok", "_score"),
            "after_token_budget",
        )

    if split:
        from bloom_filters_spark.operators.sampling import hash_split

        df = hash_split(df, split, key_col=key_col, salt=cur.SALT_SPLIT)

    df.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    stages["rows_out"] = out.count()
    metrics = {
        "input": args.input,
        "stages": stages,
        **(
            {
                "splits": {
                    r["split"]: r["n"]
                    for r in out.groupBy("split")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            }
            if split
            else {}
        ),
        "wall_sec": round(time.time() - t0, 2),
    }
    line = json.dumps(metrics)
    print(line)
    with open(args.output.rstrip("/") + "_metrics.json", "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
