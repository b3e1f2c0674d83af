"""Streaming dedup: exact (watermark + dropDuplicates), stateful
seen-fingerprint (applyInPandasWithState with a per-bucket Bloom
filter — the reference's sketch state as Spark streaming state), and a
foreachBatch incremental near-dup pattern.

SURVEY.md §2.6 ("streaming variant"): the batch engine is the primary
target; these provide the readStream → dedup → writeStream path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloom_filters_spark.functions.text import doc_fingerprint_expr
from bloom_filters_spark.sketches.bloom import BloomFilter


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Spark-native streaming dedup: keep the first row per key within
    the watermark window (state auto-expired by the watermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def streaming_fingerprint_dedup(
    stream: DataFrame,
    text_col: str = "text",
    n_buckets: int = 16,
    bloom_capacity: int = 100_000,
    bloom_fpr: float = 1e-4,
):
    """Custom stateful operator: per-bucket Bloom filter state over
    document fingerprints — emits only rows whose fingerprint was not
    seen before in the bucket (false-positive rate = Bloom fpr: a tiny
    fraction of NEW docs may be dropped; NO duplicates pass).

    State = the reference's Bloom JSON bytes (saveAsJSON checkpoint
    format) keyed by fingerprint bucket: sketch state as Spark streaming
    state, merged incrementally across micro-batches.
    """
    with_fp = stream.withColumn("fp", doc_fingerprint_expr(F.col(text_col)))
    with_bucket = with_fp.withColumn(
        "bucket", F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int")
    )
    out_schema = T.StructType(
        with_bucket.schema.fields.copy()
    )
    state_schema = T.StructType([T.StructField("bloom", T.BinaryType())])

    cap, fpr = bloom_capacity, bloom_fpr

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            (blob,) = state.get
            bloom = BloomFilter.from_bytes(bytes(blob))
        else:
            bloom = BloomFilter.create(cap, fpr)
        for pdf in pdf_iter:
            fps = [str(v) for v in pdf["fp"].tolist()]
            seen = bloom.has_batch(fps)
            fresh = pdf[~seen]
            if len(fresh):
                # also dedup within the batch itself
                fresh = fresh.drop_duplicates(subset=["fp"])
                bloom.add_batch([str(v) for v in fresh["fp"].tolist()])
                yield fresh
        state.update((bloom.to_bytes(),))

    return with_bucket.groupBy("bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_incremental_near_dup(
    spark,
    stream: DataFrame,
    cfg,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
):
    """foreachBatch incremental near-dup: each micro-batch's signatures
    are banded and joined against the accumulated BAND store (then both
    bands and signatures are appended), emitting pairs (new doc, any
    doc) — the standard incremental-LSH pattern where stream state
    lives in tables, not in executor memory.

    The band store is what makes this O(batch) instead of O(stream):
    the old side is a plain parquet scan of 16-byte (band_hash, id)
    rows, NOT a re-banding of every stored signature per micro-batch.
    Signatures are stored too, but touched only by the (tiny) candidate
    verification join.

    Returns the StreamingQuery; pairs append to ``store_dir``/pairs.
    """
    import os

    from bloom_filters_spark.operators.minhash_spark import estimated_jaccard_expr
    from bloom_filters_spark.pipeline import lsh_bands, signatures

    sig_store = os.path.join(store_dir, "signatures")
    band_store = os.path.join(store_dir, "bands")
    pair_store = os.path.join(store_dir, "pairs")

    def process_batch(batch_df, epoch_id):
        sigs = signatures(batch_df, cfg, id_col, text_col).persist()
        if sigs.take(1):
            new_bands = lsh_bands(sigs, cfg, id_col).persist()
            try:
                old_bands = spark.read.parquet(band_store).withColumnRenamed(
                    id_col, "id_old"
                )
                old_sigs = spark.read.parquet(sig_store)
                have_store = True
            except Exception:
                have_store = False
            if have_store:
                cands = (
                    new_bands.join(old_bands, ["band_id", "band_hash"])
                    .where(F.col(id_col) != F.col("id_old"))
                    .select(
                        F.col(id_col).alias("id1"), F.col("id_old").alias("id2")
                    )
                    .dropDuplicates(["id1", "id2"])
                )
                joined = (
                    cands.join(
                        sigs.select(
                            F.col(id_col).alias("id1"),
                            F.col("signature").alias("sig1"),
                        ),
                        "id1",
                    )
                    .join(
                        old_sigs.select(
                            F.col(id_col).alias("id2"),
                            F.col("signature").alias("sig2"),
                        ),
                        "id2",
                    )
                    .withColumn(
                        "jaccard_est",
                        estimated_jaccard_expr(
                            F.col("sig1"), F.col("sig2"), cfg.num_hashes
                        ),
                    )
                    .filter(F.col("jaccard_est") >= cfg.threshold)
                    .select("id1", "id2", "jaccard_est")
                )
                joined.write.mode("append").parquet(pair_store)
            new_bands.write.mode("append").parquet(band_store)
            new_bands.unpersist()
            sigs.write.mode("append").parquet(sig_store)
        sigs.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
