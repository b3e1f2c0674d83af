"""TF-IDF keyword extraction over a document corpus — the classic
sparse-retrieval statistic (Sparck Jones 1972; the smoothed form below
is scikit-learn's documented convention), as two hash aggregates and
one vocabulary join.

Scale shape: explode → (doc, term) counts (map-side combined, the only
corpus-wide shuffle); document frequencies are derived FROM that
aggregate (second, vocabulary-sized shuffle); the corpus size is a
scalar aggregate cross-joined in (no ``count()`` driver round-trip);
per-doc top-k runs in a window PARTITIONED by document — partitions
are document-sized, never global.  The vocabulary join broadcasts by
default (whitespace-language vocabularies are Zipf-concentrated);
pass ``broadcast_vocab=False`` for giant-script corpora, same knob and
rationale as ``rare_trigram_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tf_idf_top_terms"]


def tf_idf_top_terms(
    df: DataFrame,
    k: int = 5,
    broadcast_vocab: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF.

    ``tf`` = in-document term count; ``idf = ln((N+1)/(df+1)) + 1``
    (add-one smoothed so corpus-universal terms still score > 0);
    ``score = round(tf * idf, 6)``; ranking breaks score ties on the
    term string, so results are deterministic and cross-engine
    hash-safe.  Returns ``(id, term, tf, score, rank)``.
    """
    # boundary empties filtered: trim() only strips spaces, so a
    # '\tfoo' doc would otherwise contribute a spurious '' term
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    tf = (
        df.select(id_col, F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n") + 1.0) / (F.col("_df") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
