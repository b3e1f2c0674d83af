"""Deduplication operators beyond MinHash-LSH: exact, SimHash, n-gram
Jaccard — the standard large-scale training-data dedup toolbox.

Exact and n-gram paths are pure built-ins; SimHash is one ``mapInArrow``
kernel (bit-vote aggregation is not expressible as a cheap SQL fold at
64 bits) with a scalar pure-Python oracle (``simhash_py``) for pytest —
no per-row Python remains on any path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloom_filters_spark.functions.text import (
    doc_fingerprint_expr,
    token_count_expr,
)
from bloom_filters_spark.operators.shingles import shingles_expr


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id): canonical = min doc id among docs whose
    normalized texts share a 64-bit xxhash64 fingerprint.  One shuffle
    (window over the fingerprint).  At cluster scale the fingerprint
    groupBy is the cheapest possible dedup — 8-byte keys, map-side
    combine.  NOTE: equality is by FINGERPRINT, not confirmed
    byte-compare — at n=10^9 docs expect ~n²/2⁶⁵ ≈ 30 colliding pairs
    merged wrongly; where collision-freedom matters use the rehash
    protocol in pipeline.py's URL collapse as the model."""
    w = Window.partitionBy("fp")
    return (
        df.select(id_col, doc_fingerprint_expr(F.col(text_col)).alias("fp"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .select(id_col, "canonical_id")
    )


def keep_latest_revision(df: DataFrame, url_col: str = "url",
                         ts_col: str = "crawl_ts",
                         id_col: str = "doc_id") -> DataFrame:
    """Cross-snapshot URL dedup with latest-revision-wins semantics
    (the standard Common-Crawl recrawl policy): canonicalize the URL,
    keep per canonical URL the row with the greatest ``ts_col``
    (greatest ``id_col`` breaks ties), and report the revision count.

    Output: (canon_url, kept_id, kept_ts, n_revisions).  One shuffle
    (hash-agg on the canonical URL, map-side combined); the winner is
    an integer-exact struct-max, so results are deterministic and
    hash-safe cross-engine when ``ts_col`` is integral.
    """
    from bloom_filters_spark.functions.url import canonicalize_url_expr

    canon = canonicalize_url_expr(F.col(url_col)).alias("canon_url")
    best = F.max(F.struct(F.col(ts_col), F.col(id_col))).alias("_best")
    return (
        df.select(canon, F.col(ts_col), F.col(id_col))
        .groupBy("canon_url")
        .agg(best, F.count(F.lit(1)).alias("n_revisions"))
        .select(
            "canon_url",
            F.col("_best")[id_col].alias("kept_id"),
            F.col("_best")[ts_col].alias("kept_ts"),
            "n_revisions",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    prefix_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Blocked exact n-gram Jaccard: candidate pairs share their first
    ``prefix_tokens`` tokens (cheap deterministic blocking key), then
    exact Jaccard over w-shingle sets.  Entirely built-ins.

    ``hashed=True`` intersects int64 shingle hashes (8 bytes/shingle —
    the scale path); default intersects shingle strings (bit-identical
    to a SQL oracle, no hash-collision caveat).

    Returns (id1, id2, inter, n_union, jaccard) with jaccard rounded 6dp.
    """
    from bloom_filters_spark.operators.shingles import (
        string_shingle_sets_udf,
        tokens_expr,
    )

    toks = tokens_expr(F.col(text_col))
    # string path: Arrow-batched UDF (equal to the JVM HOF chain on
    # ASCII corpora, ~10x faster); hashed path: JVM int64 shingles
    sh = (
        shingles_expr(F.col(text_col), w)
        if hashed
        else string_shingle_sets_udf(w)(F.col(text_col))
    )
    # the shingle-set HOFs are interpreted — spread them across the
    # cluster first (the parquet scan arrives in few partitions at
    # bench SFs, serializing the expensive expression work)
    par = df.sparkSession.sparkContext.defaultParallelism
    # token gate BEFORE the projection: the hashed shingle expr pads
    # token-less docs to ONE empty shingle (greatest(n-w+1,1)), which
    # would report every pair of empty docs as jaccard 1.0 — the
    # string path yields [] for them, so gate both paths identically
    prepared = df.repartition(par, id_col).filter(F.size(toks) > 0).select(
        F.col(id_col),
        F.concat_ws(" ", F.slice(toks, 1, prefix_tokens)).alias("blk"),
        sh.alias("sh"),
    ).filter(F.size("sh") > 0)
    # both join sides scan `prepared`; the shingle-string construction is
    # interpreted higher-order functions (the price of SQL-oracle-exact
    # string semantics), so computing it twice doubles the query.
    # localCheckpoint instead of persist: same reuse, but the blocks are
    # GC-cleaned with the DataFrame instead of pinned in the CacheManager
    # for the rest of the session (persist here leaked per invocation)
    prepared = prepared.localCheckpoint(eager=True)
    a = prepared.select(
        F.col("blk"), F.col(id_col).alias("id1"), F.col("sh").alias("sh1")
    )
    b = prepared.select(
        F.col("blk"), F.col(id_col).alias("id2"), F.col("sh").alias("sh2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        a.join(b, "blk")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            inter.alias("inter"),
            union.alias("n_union"),
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_py(text: str, w: int = 2) -> int:
    """Pure-Python scalar oracle for ``simhash_arrow`` — recomputes the
    identical semantics (lowered byte tokens → token hashes → rolling
    Horner w-grams → splitmix64 avalanche → distinct grams → ±1 bit
    votes) from first principles with no shared vectorized code.  Used
    by pytest only; the Arrow kernel is the one production path."""
    from bloom_filters_spark.operators.arrow_sig import (
        arrow_tokens_py,
        token_hash_py,
    )
    from bloom_filters_spark.operators.shingles import ROLL_PRIME

    M64 = (1 << 64) - 1
    toks = arrow_tokens_py(text)
    n = len(toks)
    if n == 0:
        return 0
    th = [token_hash_py(t) for t in toks]
    eff = min(n, w)
    grams = set()
    for i in range(n - eff + 1):
        acc = 0
        for j in range(eff):
            acc = (acc * ROLL_PRIME + th[i + j]) & M64
        acc ^= acc >> 30
        acc = (acc * 0xBF58476D1CE4E5B9) & M64
        acc ^= acc >> 27
        acc = (acc * 0x94D049BB133111EB) & M64
        acc ^= acc >> 31
        grams.add(acc)
    sig = 0
    for b in range(64):
        votes = sum(1 if (g >> b) & 1 else -1 for g in grams)
        if votes > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def simhash_arrow(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", w: int = 2) -> DataFrame:
    """Arrow-native SimHash: reuses the flat tokenizer / token-hash /
    rolling-gram kernels from the signature stage, then accumulates the
    64 bit-votes for ALL docs in a batch with one ``np.add.at`` — no
    per-doc Python, no string w-grams, no per-gram hash calls.

    Semantics: per doc, the DISTINCT w-gram hashes vote ±1 on each of
    64 bits; sign of the vote total forms the signature bit (standard
    Charikar SimHash).  Gram identity comes from the rolling Horner
    combine over token hashes (same domain as the near-dup shingles),
    and ``simhash_py`` recomputes the identical semantics scalar-wise
    as the pytest oracle.
    """
    import pyarrow as pa

    from bloom_filters_spark.operators.arrow_sig import (
        _flat_tokenize,
        _token_hashes,
        _ascii_lower,
        _string_array_parts,
    )
    from bloom_filters_spark.operators.shingles import ROLL_PRIME

    P = np.uint64(ROLL_PRIME)
    shifts = np.arange(64, dtype=np.uint64)
    pows2 = (np.uint64(1) << shifts)

    def compute(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            offsets, data, nulls = _string_array_parts(batch.column(1))
            base = offsets[0]
            d = _ascii_lower(data[base: offsets[-1]].copy())
            doc_offsets = offsets - base
            ts, tl, td = _flat_tokenize(d, doc_offsets)
            if nulls is not None and len(td):
                keep_tok = ~nulls[td]
                ts, tl, td = ts[keep_tok], tl[keep_tok], td[keep_tok]
            n_docs = len(ids)
            th = _token_hashes(d, ts, tl)
            # rolling w-gram combine (docs shorter than w yield one gram)
            n_tok = np.bincount(td, minlength=n_docs).astype(np.int64)
            first = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
            pos = np.arange(len(td), dtype=np.int64) - first[td]
            eff_w = np.minimum(n_tok, w)
            gmask = pos <= (n_tok - eff_w)[td]
            gstart = np.flatnonzero(gmask)
            gdoc = td[gstart]
            gw = eff_w[gdoc]
            acc = np.zeros(len(gstart), dtype=np.uint64)
            for j in range(int(gw.max()) if len(gw) else 0):
                alive = gw > j
                acc[alive] = acc[alive] * P + th[gstart[alive] + j]
            # finalize: Horner/multiplicative hashes have weakly-mixed
            # low bits; SimHash consumes every bit as an independent
            # vote, so run a splitmix64-style avalanche first (without
            # it, correlated low bits produced ~10x spurious pairs)
            acc ^= acc >> np.uint64(30)
            acc *= np.uint64(0xBF58476D1CE4E5B9)
            acc ^= acc >> np.uint64(27)
            acc *= np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
            # per-doc DISTINCT grams: sort by (doc, hash), drop run-dups
            if len(acc):
                order = np.lexsort((acc, gdoc))
                gd, ga = gdoc[order], acc[order]
                keep = np.ones(len(ga), dtype=bool)
                keep[1:] = (gd[1:] != gd[:-1]) | (ga[1:] != ga[:-1])
                gd, ga = gd[keep], ga[keep]
            else:
                gd, ga = gdoc, acc
            votes = np.zeros((n_docs, 64), dtype=np.int64)
            if len(ga):
                # gd is sorted (lexsort above): per-doc bit-vote totals
                # as 64 CONTIGUOUS 1-D segment reductions — 20x faster
                # than np.add.at's random scatter into (n_docs, 64), and
                # far faster than axis-0 reduceat on the strided 2-D bit
                # matrix (measured 0.25s vs 5.2s vs 3.0s at 850k grams)
                starts = np.flatnonzero(
                    np.concatenate(([True], gd[1:] != gd[:-1]))
                )
                seg_docs = gd[starts]
                seg_n = np.diff(np.concatenate((starts, [len(gd)])))
                ones = np.empty((len(starts), 64), dtype=np.int64)
                for b in range(64):
                    col = ((ga >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                    ones[:, b] = np.add.reduceat(col, starts)
                votes[seg_docs] = 2 * ones - seg_n[:, None]
            sig = ((votes > 0).astype(np.uint64) * pows2[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(sig.view(np.int64))],
                names=[id_col, "simhash"],
            )

    return df.select(id_col, text_col).mapInArrow(
        compute, f"{id_col} long, simhash long"
    )


def simhash_table(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", w: int = 2) -> DataFrame:
    return simhash_arrow(df, id_col, text_col, w)


def simhash_dup_pairs(df: DataFrame, max_hamming: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash near-dup pairs via the 4-block pigeonhole trick: split the
    64-bit signature into 4 × 16-bit blocks; any pair within Hamming
    distance <= 3 must agree on at least one block → equi-join per block
    (4 shuffles on 16-bit keys), then exact Hamming filter via
    bit_count(xor).  No O(n^2) comparisons.

    Token-less docs (empty/whitespace/null text) are dropped first:
    they would all hash to signature 0 and report every mutual pair as
    a hamming-0 duplicate (and pile into one hot join group)."""
    sims = simhash_table(
        df.filter(token_count_expr(F.col(text_col)) > 0), id_col, text_col
    )
    blocks = sims.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                for b in range(4)
            ])
        ).alias("block_id", "block_val"),
    )
    a = blocks.select(
        "block_id", "block_val",
        F.col(id_col).alias("id1"), F.col("simhash").alias("s1"),
    )
    b = blocks.select(
        "block_id", "block_val",
        F.col(id_col).alias("id2"), F.col("simhash").alias("s2"),
    )
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        a.join(b, ["block_id", "block_val"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )
