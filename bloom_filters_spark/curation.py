"""Shared curation stages for the spark-submit jobs.

`jobs/near_dup_job.py` and `jobs/curate_job.py` both expose pre-dedup
curation flags; the stage implementations live HERE so the two entry
points cannot drift — in particular the per-stage hash salts, which
must stay distinct across composed md5-ordered selections (see
``operators/sampling.py`` on composed-selection bias) and identical
between jobs so a corpus curated by either job selects the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the one place per-stage salts are coordinated
SALT_DOMAIN_CAP = "cap"
SALT_SAMPLE = "sample"
SALT_STRATIFY = "stratify"
SALT_SPLIT = "split"
SALT_TOKEN_BUDGET = "budget"


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style composite gates (default thresholds)."""
    from bloom_filters_spark.functions.text import gopher_flags_exprs

    return df.filter(gopher_flags_exprs(F.col(text_col))["keep"])


def rarity_filter(
    df: DataFrame,
    max_rare_ppm: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Drop docs whose rare-trigram fraction exceeds ``max_rare_ppm``
    (corpus-relative gibberish gate).  ``broadcast_vocab=False`` for
    corpora whose trigram vocabulary is too large to broadcast (CJK at
    web scale)."""
    from bloom_filters_spark.functions.text import rare_trigram_stats

    scores = rare_trigram_stats(
        df, id_col=key_col, text_col=text_col,
        broadcast_vocab=broadcast_vocab,
    )
    keep = scores.filter(F.col("rare_ppm") <= max_rare_ppm).select(key_col)
    return df.join(keep, key_col, "left_semi")


def exact_dedup_keep_min(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-key row per normalized-text fingerprint, via the
    library's exact_dedup mapping (xxhash64 8-byte fingerprints — the
    cheapest dedup shuffle; do not re-derive a string-key variant)."""
    from bloom_filters_spark.operators.dedup import exact_dedup

    mapping = exact_dedup(df, id_col=key_col, text_col=text_col)
    keep = mapping.filter(
        F.col(key_col) == F.col("canonical_id")
    ).select(key_col)
    return df.join(keep, key_col, "left_semi")


def domain_cap(
    df: DataFrame, k: int, key_col: str, url_col: str = "url"
) -> DataFrame:
    """At most ``k`` docs per host (C4-style), host from the
    canonicalized URL authority."""
    from bloom_filters_spark.functions.url import host_expr
    from bloom_filters_spark.operators.sampling import per_stratum_cap

    return per_stratum_cap(
        df.withColumn("_host", host_expr(F.col(url_col))),
        "_host", k, key_col=key_col, salt=SALT_DOMAIN_CAP,
    ).drop("_host")


def blocklist_filter(
    df: DataFrame, blocked_hosts, url_col: str = "url"
) -> DataFrame:
    """Drop docs whose host is a blocked domain or subdomain of one."""
    from bloom_filters_spark.functions.url import host_blocked_expr

    return df.filter(~host_blocked_expr(F.col(url_col), blocked_hosts))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str
) -> DataFrame:
    """Shuffle-free deterministic sample by salted md5(key) prefix."""
    from bloom_filters_spark.operators.sampling import (
        hash_threshold_sample,
    )

    return hash_threshold_sample(
        df, fraction, key_col=key_col, salt=SALT_SAMPLE
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 structural document gate (Raffel et al. 2020 §2.2): keep rows
    passing the lorem-ipsum / brace / min-sentence composite computed
    over C4-kept lines.  The verdict is a pure per-row expression
    (functions/text.c4_exprs), so this is a shuffle-free inline filter
    — no id minting, no join back, all payload columns survive."""
    from bloom_filters_spark.functions.text import c4_exprs

    return df.filter(
        c4_exprs(F.col(text_col), min_words, min_sentences)["keep"]
    )


def dsir_top_select(
    df: DataFrame,
    target_expr: str,
    k: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR stage: keep the ``k`` documents whose hashed-n-gram
    distribution best matches the target slice ``target_expr`` (a SQL
    boolean over the input's own columns, e.g. ``lang = 'en'``).
    Production bucket hash (xxhash64); selection is the deterministic
    ranking head via distributed TakeOrdered; survivors keep every
    input column via a key semi-join."""
    from bloom_filters_spark.operators.dsir import (
        dsir_importance_weights,
        dsir_select,
    )

    slim = df.select(key_col, text_col)
    weights = dsir_importance_weights(
        slim,
        df.filter(F.expr(target_expr)).select(key_col, text_col),
        n_buckets=n_buckets, id_col=key_col, text_col=text_col,
    )
    keep = dsir_select(weights, k, id_col=key_col).select(key_col)
    return df.join(keep, key_col, "left_semi")
