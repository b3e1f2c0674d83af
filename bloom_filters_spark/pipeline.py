"""Near-duplicate detection + clustering pipeline (the flagship flow).

    pages/documents → shingles → MinHash signatures → LSH bands →
    candidate pairs → Jaccard verify → connected components → clusters

Stage boundaries (= shuffles): band grouping, pair dedup, verify join,
label propagation.  Everything before banding is one map-only stage
(JVM shingling + one Arrow-batched pandas UDF for signatures).

Verification semantics: ``verify="estimate"`` applies the reference's
``compareWith`` decision — (# equal signature positions)/k >= threshold
(``/root/reference/src/sketch/min-hash.ts:117-132``) — which is the
parity target for dup-pair recall.  ``verify="exact"`` uses exact
Jaccard over shingle sets (the reference's own test oracle,
``tests/min-hash.test.ts:8-11``).  ``"both"`` returns the two columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.operators.components import connected_components
from bloom_filters_spark.operators.minhash_spark import (
    bands_expr,
    estimated_jaccard_expr,
    exact_jaccard_expr,
    make_signature_udf,
    signature_expr,
)
from bloom_filters_spark.operators.pairs import candidate_pairs
from bloom_filters_spark.operators.shingles import DEFAULT_MAX_VALUE, shingles_expr
from bloom_filters_spark.sketches.minhash import MinHashFactory


@dataclass
class NearDupConfig:
    shingle_size: int = 3            # w words per shingle
    num_hashes: int = 128            # k signature length
    bands: int = 32                  # b (rows r = k // b)
    max_value: int = DEFAULT_MAX_VALUE
    seed: int = DEFAULT_SEED         # MinHash param RNG seed
    threshold: float = 0.8           # Jaccard accept threshold
    verify: str = "estimate"         # estimate | exact | both
    max_band_group: int = 64         # all-pairs cap per LSH band group
    lowercase: bool = True
    # signature kernel: "pandas" (Arrow-batched numpy, ~8k docs/s/32cores)
    # or "jvm" (built-in transform/array_min — higher-order functions are
    # interpreted, not codegen'd: measured 11x slower at 50k docs)
    signature_impl: str = "pandas"
    # shingle derivation:
    # * "arrow" (default, the scale path): ONE mapInArrow stage doing
    #   tokenize + token hash + shingle combine + MinHash entirely on
    #   flat numpy buffers — zero per-row Python objects, no JVM
    #   higher-order functions (which are interpreted, allocation-heavy,
    #   and measured to ANTI-scale 8→32 cores on bandwidth-bound boxes);
    #   emits int32 signatures and skips shingle materialization unless
    #   verify needs exact Jaccard
    # * "token_hash": JVM xxhash64 per token + fused pandas-UDF shingle
    #   combine/MinHash — kept for parity with the xxhash64 token domain
    # * "string": materializes w-gram strings, xxhash64 each —
    #   SQL-oracle-checkable (DuckDB can recompute), 10x slower
    shingle_impl: str = "arrow"
    # LSH band hashing: "arrow" (default — vectorized mapInArrow over
    # flat signature buffers; the JVM alternatives allocate a slice +
    # struct per band per row, and that allocation rate is what caps the
    # stage on bandwidth-bound hosts: measured flat 4.5s at 8 AND 32
    # cores for "jvm_unrolled" vs 2.5s→1.0s scaling for "arrow"),
    # "jvm_unrolled" (literally unrolled slice/xxhash64 expressions,
    # codegen'd, no Python crossing), or "jvm_hof" (transform/sequence
    # higher-order functions — interpreted, worst of both)
    band_impl: str = "arrow"
    # fuse banding into the signature kernel (arrow impl only): the full
    # pipeline never materializes a per-doc signature column — bands
    # stream out of the text kernel as 16-byte rows, and signatures are
    # recomputed only for candidate-pair participants in the verify
    # stage.  Biggest single win on bandwidth-bound hosts.
    fuse_bands: bool = True
    # band-hash width on the arrow band impls (fused or two-stage):
    # 32 xor-
    # folds the hash, cutting the widest shuffle's rows 16 → 12 bytes at
    # the price of ~n_rows²/2³³ colliding candidate groups.  Merged
    # groups usually only ADD verify work; to keep a collision from
    # pushing a small genuine group past max_band_group (star-linking
    # through a foreign anchor = recall loss), candidate_pairs groups
    # 32-bit bands by (band_id, band_hash) instead of the hash alone
    # (operators/pairs.py _band_key).  Adopted as the default after the
    # round-5 paired ABBA measurement (BENCH/scaling_8_32.json
    # "hash32_paired_r5": 0.871x wall at 32 pinned cores, 0.993x at 8 —
    # the band exchange is bandwidth-bound, so 25% fewer bytes in the
    # widest shuffle shows up directly).  Pin 64 to read band tables
    # checkpointed before the switch (checkpoint.py and the incremental
    # path raise on a width mismatch rather than mis-join).  None (the
    # default) means impl-appropriate: 32 on the arrow kernels, 64 on
    # the JVM expression impls (which only emit the full 64-bit hash —
    # an EXPLICIT 32 with a JVM impl raises rather than lie about the
    # emitted width).
    band_hash_bits: int | None = None
    # CMS frequent-shingle (boilerplate) pruning: shingles appearing in
    # more than this fraction of documents are dropped before MinHash —
    # navigation chrome / legal footers otherwise dominate signatures
    # and create hot LSH bands.  None disables.  Scale (arrow fused)
    # path only; the detection pass emits a few hundred candidate rows,
    # not the shingle universe (see detect_hot_shingles).
    boilerplate_max_df: float | None = None
    # HLL-gated exact pre-dedup: estimate distinct text fingerprints
    # with native HLL++ (approx_count_distinct — one map-side-combined
    # scan); when the estimated exact-duplicate rate exceeds
    # prededup_min_rate, collapse byte-identical (normalized) texts to
    # one representative before MinHash/LSH and re-expand afterwards.
    # Web corpora are commonly 30-50% exact dups — collapsing first
    # saves that fraction of signature compute and shrinks hot bands.
    # Cluster-assignment-preserving: identical texts always estimate
    # Jaccard 1 and link anyway; empty-normalized texts are exempted so
    # they stay singletons exactly like the base path.  (The internal
    # PAIRS stage then reports representative pairs only, so parity
    # tests that compare raw pairs keep this "off"; cluster output is
    # identical either way.)  "auto" | "on" | "off"; default off,
    # pages_near_dup opts into "auto".
    exact_prededup: str = "off"
    prededup_min_rate: float = 0.05
    # candidate-pair exchange strategy (operators/pairs.py):
    # "grouped" — one shuffle straight to collect_list (fastest when the
    # band exchange fits executor memory comfortably);
    # "count_join" — pre-count band hashes and collect_list only the
    # duplicated ones (caps per-key buffer state; the band table is
    # consumed twice);
    # "auto" — grouped below pair_mode_threshold input rows, count_join
    # above (collect_list buffer state is the memory risk at corpus
    # scale, and the second band pass amortizes once the exchange is
    # large enough to dominate).
    pair_mode: str = "auto"
    pair_mode_threshold: int = 2_000_000
    cache_signatures: bool = True    # sigs feed banding AND both verify joins

    def __post_init__(self):
        if self.num_hashes % self.bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        if self.band_hash_bits not in (None, 32, 64):
            raise ValueError("band_hash_bits must be 32, 64, or None")

    @property
    def rows_per_band(self) -> int:
        return self.num_hashes // self.bands

    @property
    def resolved_band_hash_bits(self) -> int:
        """``band_hash_bits`` with the ``None`` default resolved to the
        impl that will actually band: 32 on the arrow kernels (the
        shipped default path), 64 when only the JVM expression impls
        run (they always emit the full 64-bit Horner hash)."""
        if self.band_hash_bits is not None:
            return self.band_hash_bits
        return 32 if (self.fuse_bands or self.band_impl == "arrow") else 64

    def factory(self) -> MinHashFactory:
        return MinHashFactory(self.num_hashes, self.max_value, self.seed)


def with_shingles(df: DataFrame, cfg: NearDupConfig, text_col: str = "text") -> DataFrame:
    # token gate: shingle_strings_expr pads token-less docs to ONE
    # shingle (greatest(n-w+1, 1)), so without this filter every
    # empty/whitespace/null-text doc would share one sentinel shingle
    # and cluster together at jaccard 1.0 — the arrow and token_hash
    # impls drop such docs, so the string path must too
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    return df.filter(F.size(toks) > 0).withColumn(
        "shingles",
        shingles_expr(F.col(text_col), cfg.shingle_size, cfg.max_value, cfg.lowercase),
    )


def with_signature(df: DataFrame, cfg: NearDupConfig) -> DataFrame:
    """Adds ``signature``; drops docs with empty shingle sets (the
    reference's empty-MinHash guard, min-hash.ts:75-77).

    Both impls compute the identical signature; "jvm" keeps the whole
    map stage in codegen (no Python workers), "pandas" is the
    Arrow-batched kernel (useful where the params array would bloat the
    plan, or k is very large).
    """
    df = df.filter(F.size("shingles") > 0)
    if cfg.signature_impl == "pandas":
        sig_udf = make_signature_udf(cfg.factory())
        return df.withColumn("signature", sig_udf("shingles"))
    return df.withColumn("signature", signature_expr(F.col("shingles"), cfg.factory()))


def signatures(df: DataFrame, cfg: NearDupConfig, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, text) → (id[, shingles], signature) — the map-only front half.

    The "arrow" impl only materializes shingle sets when the verify mode
    needs exact Jaccard — in estimate mode the signature alone feeds
    banding and verification, and shingle arrays are pure Arrow/persist
    overhead (measured ~16s of 28s stage time at 200k docs × 32 cores).
    """
    if cfg.shingle_impl == "arrow":
        from bloom_filters_spark.operators.arrow_sig import signatures_arrow

        return signatures_arrow(
            df,
            cfg.factory(),
            shingle_size=cfg.shingle_size,
            max_value=cfg.max_value,
            id_col=id_col,
            text_col=text_col,
            need_shingles=cfg.verify in ("exact", "both"),
        )
    if cfg.shingle_impl == "token_hash":
        from bloom_filters_spark.operators.minhash_spark import (
            make_token_signature_udf,
        )
        from bloom_filters_spark.operators.shingles import token_hashes_expr

        udf = make_token_signature_udf(
            cfg.factory(), cfg.shingle_size, cfg.max_value
        )
        return (
            df.select(
                id_col,
                udf(token_hashes_expr(F.col(text_col), cfg.lowercase)).alias("ss"),
            )
            .filter(F.col("ss.signature").isNotNull())
            .select(id_col, "ss.shingles", "ss.signature")
        )
    return with_signature(
        with_shingles(df.select(id_col, text_col), cfg, text_col), cfg
    ).select(id_col, "shingles", "signature")


def lsh_bands(sigs: DataFrame, cfg: NearDupConfig, id_col: str = "doc_id") -> DataFrame:
    """signatures → exploded (band_id, band_hash, doc_id)."""
    if cfg.band_impl == "arrow":
        from bloom_filters_spark.operators.arrow_sig import bands_arrow

        return bands_arrow(sigs, cfg.bands, cfg.rows_per_band, id_col,
                           hash_bits=cfg.resolved_band_hash_bits)
    if cfg.band_hash_bits == 32:
        # the JVM expression impls always emit the full 64-bit Horner
        # hash; refuse an EXPLICIT 32 rather than emit a width the
        # config disclaims (the None default resolves to 64 here)
        raise ValueError(
            f"band_impl={cfg.band_impl!r} only emits 64-bit band hashes; "
            "set band_hash_bits=64 (the arrow impls support 32)"
        )
    from bloom_filters_spark.operators.minhash_spark import bands_unrolled_expr

    expr = bands_unrolled_expr if cfg.band_impl == "jvm_unrolled" else bands_expr
    return sigs.select(
        id_col,
        F.explode(expr(F.col("signature"), cfg.bands, cfg.rows_per_band)).alias(
            "band"
        ),
    ).select(id_col, "band.band_id", "band.band_hash")


def verified_pairs(
    pairs: DataFrame,
    sigs: DataFrame,
    cfg: NearDupConfig,
    id_col: str = "doc_id",
    sigs_restricted: bool = False,
) -> DataFrame:
    """Candidate pairs → pairs with jaccard column(s), filtered at
    cfg.threshold on the decision column.

    Join strategy: the set of docs participating in any candidate pair
    is usually tiny relative to the corpus (dups are rare), so we first
    semi-join the signature table down to participants, then join pairs
    to that reduced side.  With AQE the reduced side typically falls
    under the broadcast threshold → two broadcast joins instead of two
    full shuffles of the (wide) signature table.  At adversarial pair
    volumes AQE falls back to a shuffle join on the reduced table —
    still strictly less data than joining the full signature table.
    """
    need_shingles = cfg.verify in ("exact", "both")
    if sigs_restricted:
        # caller already semi-joined sigs down to pair participants
        # (the fused and incremental paths do) — skip the redundant
        # distinct + semi-join over the candidate set
        side = sigs
    else:
        ids = (
            pairs.select(F.col("id1").alias(id_col))
            .unionByName(pairs.select(F.col("id2").alias(id_col)))
            .distinct()
        )
        side = sigs.join(ids, id_col, "left_semi")
    s1 = side.select(
        F.col(id_col).alias("id1"),
        F.col("signature").alias("sig1"),
        *([F.col("shingles").alias("sh1")] if need_shingles else []),
    )
    s2 = side.select(
        F.col(id_col).alias("id2"),
        F.col("signature").alias("sig2"),
        *([F.col("shingles").alias("sh2")] if need_shingles else []),
    )
    joined = pairs.join(s1, "id1").join(s2, "id2")

    out_cols = [F.col("id1"), F.col("id2")]
    est = estimated_jaccard_expr(F.col("sig1"), F.col("sig2"), cfg.num_hashes)
    if cfg.verify == "estimate":
        joined = joined.withColumn("jaccard_est", est)
        decision = F.col("jaccard_est")
        out_cols.append(F.col("jaccard_est"))
    elif cfg.verify == "exact":
        joined = joined.withColumn(
            "jaccard", exact_jaccard_expr(F.col("sh1"), F.col("sh2"))
        )
        decision = F.col("jaccard")
        out_cols.append(F.col("jaccard"))
    else:  # both: decide on the exact value, report both
        joined = joined.withColumn("jaccard_est", est).withColumn(
            "jaccard", exact_jaccard_expr(F.col("sh1"), F.col("sh2"))
        )
        decision = F.col("jaccard")
        out_cols += [F.col("jaccard"), F.col("jaccard_est")]

    return joined.filter(decision >= F.lit(cfg.threshold)).select(*out_cols)


def _default_url_hash(col, round_: int):
    """Round-0 keying is plain ``xxhash64(url)`` (identical ids to
    key_mode="hash64" when no collision exists); later probe rounds mix
    the round number in as an extra hashed column."""
    return F.xxhash64(col) if round_ == 0 else F.xxhash64(col, F.lit(round_))


def collision_free_url_ids(
    pages: DataFrame,
    url_col: str = "url",
    hash_fn=None,
    max_rounds: int = 8,
) -> DataFrame:
    """Deterministic, collision-FREE url → 64-bit id map
    ``(url, _nid)``.

    Round 0 keys every distinct url with ``hash_fn(url, 0)``.  If two
    distinct urls collide on an id, the lexicographically smallest url
    keeps it and the others re-key with ``hash_fn(url, round)``,
    re-checking the FULL id set each round — so a re-keyed id can never
    silently collide with an existing one either.  Expected rounds
    beyond the first check: ~n²/2^64 (zero in practice); each check is
    one aggregate over (id, url) rows.  Every decision (min-url keeps,
    round-numbered rehash) is deterministic, so the map is stable
    across runs and resumable checkpoints.
    """
    hash_fn = hash_fn or _default_url_hash
    ids = (
        pages.select(url_col)
        .distinct()
        .withColumn("_nid", hash_fn(F.col(url_col), 0))
    )
    for round_ in range(1, max_rounds + 1):
        dup = (
            ids.groupBy("_nid")
            .agg(
                F.min(url_col).alias("_keep_url"),
                F.count(F.lit(1)).alias("_n"),
            )
            .filter(F.col("_n") > 1)
            .select("_nid", "_keep_url")
        )
        # collisions are ~n²/2^64 of the key space — always broadcastable
        losers = (
            ids.join(F.broadcast(dup), "_nid")
            .filter(F.col(url_col) != F.col("_keep_url"))
            .select(url_col)
        )
        loser_urls = [r[0] for r in losers.collect()]
        if not loser_urls:
            return ids
        rekeyed = (
            pages.sparkSession.createDataFrame(
                [(u,) for u in loser_urls], f"{url_col} string"
            )
            .withColumn("_nid", hash_fn(F.col(url_col), round_))
        )
        ids = ids.join(
            F.broadcast(rekeyed.select(url_col)), url_col, "left_anti"
        ).unionByName(rekeyed)
    raise RuntimeError(
        f"collision_free_url_ids: collisions persisted after {max_rounds} "
        f"rehash rounds — astronomically unlikely with a real 64-bit hash; "
        f"check the injected hash_fn"
    )


def pages_near_dup(
    pages: DataFrame,
    cfg: NearDupConfig | None = None,
    url_col: str = "url",
    text_col: str | None = "text",
    lang: str | None = None,
    extractor: str = "simple",
    key_mode: str = "hash64",
    canonicalize_urls: bool = False,
) -> DataFrame:
    """input_hint entry point: ``pages(url, warc_ts, html, text, lang)``
    → ``(url, cluster_url)`` with ``cluster_url`` shared by every page in
    a near-duplicate component.

    * keys are urls (strings); internally each url maps to
      ``xxhash64(url)`` so the Arrow kernels and shuffles move 8-byte
      ids, not urls.  Expected 64-bit collisions ≈ n²/2^65: ~0.03 at
      10^9 docs but ~27,000 at the advertised 10^12 — each one silently
      merging two unrelated urls into one doc id (and hence one
      cluster).  ``key_mode="collision_free"`` removes the leak: ids
      come from :func:`collision_free_url_ids` (deterministic rehash
      probing, smallest url keeps the contested id), at the cost of one
      distinct + one verification aggregate over the url set.  The
      default stays "hash64" — the right trade below ~10^10 docs;
    * ``text_col=None`` extracts text from ``html`` via
      ``sources.pages.extract_text_expr`` (byte-identical per url);
    * ``lang="en"`` prunes by language BEFORE any kernel — a native
      filter Catalyst pushes into the scan;
    * ``canonicalize_urls=True`` collapses url VARIANTS of the same
      resource (``www.``, default ports, ``utm_*``/fragment debris —
      :func:`functions.url.canonicalize_url_expr`) into ONE document
      before any text work: the content pipeline runs once per
      canonical url (representative text = the lexicographically
      smallest member url's text, a deterministic ``min_by``), and
      every member url inherits its canonical url's cluster.  At CC
      scale this is the standard first dedup stage — it removes the
      ~10-30% of fetches that are trivial url aliases for the cost of
      one partial-aggregatable shuffle over ``(canon, url)``, shrinking
      the corpus the expensive MinHash stages see.
    """
    if cfg is None:
        cfg = NearDupConfig(exact_prededup="auto")
    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)
    if text_col is None:
        from bloom_filters_spark.sources.pages import (
            extract_text_expr,
            extract_text_general_expr,
        )

        extract = (
            extract_text_general_expr
            if extractor == "general"
            else extract_text_expr
        )
        pages = pages.withColumn("_text", extract(F.col("html")))
        text_col = "_text"
    if canonicalize_urls:
        from bloom_filters_spark.functions.url import canonicalize_url_expr

        pages = pages.withColumn(
            "_curl", canonicalize_url_expr(F.col(url_col))
        )
        # one representative (canon, text) per canonical url; min_by is
        # partial-aggregatable so this combines map-side before the
        # single shuffle on _curl
        reps = pages.groupBy("_curl").agg(
            F.min_by(F.col(text_col), F.col(url_col)).alias("_t")
        )
        key_src, key_col = reps, "_curl"
    else:
        key_src, key_col = pages, url_col
    if key_mode == "collision_free":
        id_map = collision_free_url_ids(key_src, key_col)
        keyed = key_src.join(id_map, key_col)
    else:
        keyed = key_src.withColumn("_nid", F.xxhash64(F.col(key_col)))
    if canonicalize_urls:
        keyed = keyed.select("_nid", "_curl", "_t")
        # every member url rides its canonical url's id
        urls = pages.select(F.col(url_col), "_curl").join(
            keyed.select("_nid", "_curl"), "_curl"
        ).select("_nid", url_col)
    else:
        keyed = keyed.select(
            "_nid", F.col(url_col), F.col(text_col).alias("_t")
        )
        urls = keyed.select("_nid", url_col)
    clusters = near_dup_pipeline(
        keyed.select("_nid", "_t"), cfg, id_col="_nid", text_col="_t"
    )
    # canonical member = lexicographically smallest url in the component:
    # stable under the internal key-hashing scheme (min _nid would leak
    # xxhash64 ordering into the user-visible contract) and exactly
    # replicable by a SQL oracle.  One extra tiny shuffle over the
    # (cluster_id, url) projection.
    labeled = clusters.join(urls, "_nid")
    canon = labeled.groupBy("cluster_id").agg(
        F.min(url_col).alias("cluster_url")
    )
    return labeled.join(canon, "cluster_id").select(url_col, "cluster_url")


def near_dup_pipeline(
    df: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_stages: bool = False,
):
    """Full pipeline: (id, text) → clusters(doc_id, cluster_id).

    ``return_stages=True`` also returns {sigs, bands, candidates, pairs}
    for testing/metrics.
    """
    cfg = cfg or NearDupConfig()

    # one memoized corpus count shared by the pair-mode probe and hot-
    # shingle detection: cheap (footer stats) on a raw parquet scan, but
    # a full plan execution once df is a derived frame (canonical-url
    # collapse, prededup) — never pay it twice.  Late-bound `df` on
    # purpose: both consumers run after the final rebinding of df in
    # their path, so they see the same frame.
    _n_docs: list = [None]

    def _count():
        if _n_docs[0] is None:
            _n_docs[0] = df.count()
        return _n_docs[0]

    def _pair_mode():
        if cfg.pair_mode != "auto":
            return cfg.pair_mode
        return (
            "count_join"
            if _count() > cfg.pair_mode_threshold
            else "grouped"
        )

    doc_rep = None
    if cfg.exact_prededup != "off":
        # ASCII-only lowercase (translate A-Z), matching the Arrow
        # kernel's byte-level token domain: with Unicode F.lower, two
        # texts differing only in non-ASCII letter case would collapse
        # here but shingle differently in the kernel — breaking the
        # "cluster output is identical either way" contract
        lowered = F.translate(
            F.col(text_col),
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            "abcdefghijklmnopqrstuvwxyz",
        )
        norm = F.regexp_replace(F.trim(lowered), r"\s+", " ")
        fps = df.select(
            id_col,
            F.when(F.length(norm) > 0, F.xxhash64(norm)).alias("_fp"),
        )
        run_prededup = cfg.exact_prededup == "on"
        if cfg.exact_prededup == "auto":
            # the HLL cardinality gate: one scan, partial-aggregated
            row = fps.filter(F.col("_fp").isNotNull()).agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("_fp").alias("d"),
            ).first()
            n_rows = row["n"] or 0
            run_prededup = n_rows > 0 and (
                row["d"] < (1.0 - cfg.prededup_min_rate) * n_rows
            )
        if run_prededup:
            rep = fps.filter(F.col("_fp").isNotNull()).groupBy("_fp").agg(
                F.min(id_col).alias("_rep")
            )
            doc_rep = fps.join(rep, "_fp", "left").select(
                id_col, F.coalesce("_rep", F.col(id_col)).alias("_rep")
            ).persist()
            rep_ids = doc_rep.filter(F.col(id_col) == F.col("_rep")).select(
                id_col
            )
            df = df.join(rep_ids, id_col, "left_semi")
    sigs = None
    sigs_restricted = False
    if cfg.shingle_impl == "arrow" and cfg.fuse_bands:
        # scale path: text → (doc_id, band_hash) in one Arrow stage.
        # The full-corpus signature matrix never leaves the kernel —
        # persisting/caching wide array<int> columns was measured to
        # dominate the whole pipeline on bandwidth-bound hosts (the
        # columnar cache serializes arrays per row).  Signatures are
        # recomputed ONLY for docs that appear in a candidate pair
        # (dups are rare, so this is ~1% of the corpus).
        from bloom_filters_spark.operators.arrow_sig import (
            detect_hot_shingles,
            fused_band_rows,
            signatures_arrow,
        )

        hot = None
        if cfg.boilerplate_max_df is not None:
            hot = detect_hot_shingles(
                df, _count(), cfg.boilerplate_max_df,
                cfg.shingle_size, cfg.max_value, id_col, text_col,
            )
        bands = fused_band_rows(
            df, cfg.factory(), cfg.bands, cfg.rows_per_band,
            cfg.shingle_size, cfg.max_value, id_col, text_col,
            hot_shingles=hot, hash_bits=cfg.resolved_band_hash_bits,
        )
        candidates = candidate_pairs(
            bands, cfg.max_band_group, id_col, mode=_pair_mode()
        ).persist()
        n_cands = candidates.count()
        ids = (
            candidates.select(F.col("id1").alias(id_col))
            .unionByName(candidates.select(F.col("id2").alias(id_col)))
            .distinct()
        )
        # a plain semi-join would shuffle the full corpus INCLUDING the
        # text column by id (measured 1.2GB at 800k docs); the id set is
        # bounded by 2x the candidate count, so broadcast it when small
        # and let the text column stream map-side
        if n_cands < 25_000_000:
            ids = F.broadcast(ids)
        participants = df.join(ids, id_col, "left_semi")
        # participants' signatures must prune with the SAME hot set the
        # band kernel used, or verify-side estimates drift from banding
        sigs = signatures_arrow(
            participants, cfg.factory(),
            shingle_size=cfg.shingle_size, max_value=cfg.max_value,
            id_col=id_col, text_col=text_col,
            need_shingles=cfg.verify in ("exact", "both"),
            hot_shingles=hot,
        ).persist()
        sigs_restricted = True
    else:
        sigs = signatures(df, cfg, id_col, text_col)
        if cfg.cache_signatures:
            # sigs are consumed by banding and twice by the verify join;
            # at cluster scale this boundary is a checkpoint table
            sigs = sigs.persist()
        bands = lsh_bands(sigs, cfg, id_col)
        # candidates feed THREE consumers inside the verify stage (the
        # two id projections and the pair join) — without a persist the
        # whole band shuffle + pair-emit recomputes three times
        candidates = candidate_pairs(
            bands, cfg.max_band_group, id_col, mode=_pair_mode()
        ).persist()
    pairs = verified_pairs(
        candidates, sigs, cfg, id_col, sigs_restricted=sigs_restricted
    ).persist()
    # materialize the (tiny) verified edge set once; everything upstream
    # (signatures, band shuffle) is then releasable before the iterative /
    # driver-side components stage.  At cluster scale this boundary is
    # the pairs checkpoint table (checkpoint.py).
    n_pairs = pairs.count()
    clusters = connected_components(
        pairs, vertices=df.select(id_col), id_col=id_col, n_edges=n_pairs
    )
    if doc_rep is not None:
        # re-expand collapsed exact duplicates: every doc inherits its
        # representative's cluster (rep ids are per-group minima, so
        # cluster_id stays "min doc id in component")
        rep_clusters = clusters.select(
            F.col(id_col).alias("_rep"), "cluster_id"
        )
        clusters = doc_rep.join(rep_clusters, "_rep").select(
            id_col, "cluster_id"
        )
    if return_stages:
        return clusters, {
            "sigs": sigs,
            "bands": bands,
            "candidates": candidates,
            "pairs": pairs,
        }
    candidates.unpersist()
    sigs.unpersist()
    # the components stage has already materialized its labels (driver
    # union-find collects the edges; labelprop localCheckpoints), so the
    # cached edge set can be released too
    pairs.unpersist()
    if doc_rep is not None:
        doc_rep.unpersist()
    return clusters


def incremental_candidates(
    new_docs: DataFrame,
    corpus_docs: DataFrame | None = None,
    cfg: NearDupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_bands: DataFrame | None = None,
    hot_shingles=None,
) -> DataFrame:
    """Candidate (id1=new, id2=corpus) pairs between a document
    increment and an existing corpus — the rolling-crawl shape: the
    corpus is NEVER re-paired against itself, so daily cost is
    proportional to the increment, not the archive.

    Pass ``corpus_bands`` (the ``(id, band_id, band_hash)`` table a
    previous full run checkpointed via ``checkpoint.py``) to skip
    recomputing corpus bands entirely; then the corpus side of this
    operator is a table READ and the only kernel work is one fused
    Arrow pass over the (small) new batch.  The band equi-join touches
    corpus rows only on matched keys.  Hot (boilerplate) bands are the
    skew risk exactly as in the self-join path.

    Boilerplate pruning (``cfg.boilerplate_max_df``) must use the SAME
    hot-shingle set on both sides or band hashes stop being comparable
    (a silent recall loss): when the corpus text is available the hot
    set is detected on it here and applied to both sides; when a
    checkpointed ``corpus_bands`` table replaces the corpus text, pass
    the full run's persisted set as ``hot_shingles`` — this function
    refuses to guess.
    """
    from bloom_filters_spark.operators.arrow_sig import (
        detect_hot_shingles,
        fused_band_rows,
    )

    cfg = cfg or NearDupConfig()
    hot = hot_shingles
    if corpus_bands is None:
        if corpus_docs is None:
            raise ValueError("need corpus_docs or corpus_bands")
        if cfg.boilerplate_max_df is not None and hot is None:
            hot = detect_hot_shingles(
                corpus_docs, corpus_docs.count(), cfg.boilerplate_max_df,
                cfg.shingle_size, cfg.max_value, id_col, text_col,
            )
        corpus_bands = fused_band_rows(
            corpus_docs, cfg.factory(), cfg.bands, cfg.rows_per_band,
            cfg.shingle_size, cfg.max_value, id_col, text_col,
            hot_shingles=hot, hash_bits=cfg.resolved_band_hash_bits,
        )
    else:
        if cfg.boilerplate_max_df is not None and hot is None:
            raise ValueError(
                "cfg.boilerplate_max_df is set but corpus_bands is a "
                "precomputed table and no hot_shingles were passed: the "
                "increment would band WITHOUT the pruning the corpus "
                "banded WITH, silently missing near-dups.  Pass the "
                "full run's hot-shingle set (hot_shingles=...) or unset "
                "boilerplate_max_df."
            )
        # a checkpointed band table must carry the SAME hash width the
        # increment will emit: the implicit int->long cast in the join
        # would return zero matches without an error
        expect = "int" if cfg.resolved_band_hash_bits == 32 else "bigint"
        actual = dict(corpus_bands.dtypes).get("band_hash")
        if actual != expect:
            raise ValueError(
                f"corpus_bands.band_hash is {actual} but "
                f"cfg band width {cfg.resolved_band_hash_bits} emits {expect}: "
                "band hashes would never match across the join"
            )
    new_bands = fused_band_rows(
        new_docs, cfg.factory(), cfg.bands, cfg.rows_per_band,
        cfg.shingle_size, cfg.max_value, id_col, text_col,
        hot_shingles=hot, hash_bits=cfg.resolved_band_hash_bits,
    )
    bn = new_bands.select(
        "band_id", "band_hash", F.col(id_col).alias("id1")
    )
    bo = corpus_bands.select(
        "band_id", "band_hash", F.col(id_col).alias("id2")
    )
    return (
        bn.join(bo, ["band_id", "band_hash"])
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )


def near_dup_against(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_bands: DataFrame | None = None,
    hot_shingles=None,
) -> DataFrame:
    """Verified near-dup pairs (id1=new, id2=corpus, jaccard) between an
    increment and an existing corpus: ``incremental_candidates`` + the
    production verify stage (estimate / exact / both per
    ``cfg.verify``), with signatures computed ONLY for pair
    participants on both sides.  Ids must be disjoint across the two
    tables (they address one namespace, as in a rolling crawl).
    ``corpus_docs`` supplies participant text for the verify stage even
    when ``corpus_bands`` short-circuits the banding; ``hot_shingles``
    forwards the full run's boilerplate set (see
    ``incremental_candidates``) and prunes the verify-side signatures
    identically."""
    from bloom_filters_spark.operators.arrow_sig import (
        detect_hot_shingles,
        signatures_arrow,
    )

    cfg = cfg or NearDupConfig()
    if (
        cfg.boilerplate_max_df is not None
        and hot_shingles is None
        and corpus_bands is None
    ):
        # detect once HERE so banding (inside incremental_candidates)
        # and the verify-side signatures prune with the same set
        hot_shingles = detect_hot_shingles(
            corpus_docs, corpus_docs.count(), cfg.boilerplate_max_df,
            cfg.shingle_size, cfg.max_value, id_col, text_col,
        )
    # persist + count: the candidate set is consumed by the id union
    # (twice), the semi-join, and the pair join inside verified_pairs —
    # without a materializing action the persist is a no-op and the
    # band join would re-execute for each of them.  The count also
    # gates the broadcast exactly like near_dup_pipeline does.
    cands = incremental_candidates(
        new_docs, corpus_docs, cfg, id_col, text_col, corpus_bands,
        hot_shingles,
    ).persist()
    n_cands = cands.count()
    participants = new_docs.select(id_col, text_col).unionByName(
        corpus_docs.select(id_col, text_col)
    )
    ids = (
        cands.select(F.col("id1").alias(id_col))
        .unionByName(cands.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    if n_cands < 25_000_000:
        ids = F.broadcast(ids)
    participants = participants.join(ids, id_col, "left_semi")
    sigs = signatures_arrow(
        participants, cfg.factory(),
        shingle_size=cfg.shingle_size, max_value=cfg.max_value,
        id_col=id_col, text_col=text_col,
        need_shingles=cfg.verify in ("exact", "both"),
        hot_shingles=hot_shingles,
    )
    # materialize the (tiny) verified edge set so the candidate cache —
    # the big intermediate — is released here instead of lingering
    # until LRU eviction in a long-lived session
    out = verified_pairs(
        cands, sigs, cfg, id_col, sigs_restricted=True
    ).persist()
    out.count()
    cands.unpersist()
    return out
