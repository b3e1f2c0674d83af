"""Paragraph-level deduplication — the Dolma/FineWeb-style third
granularity between document-level (exact/MinHash) and substring-level
(`operators/substring.py`) dedup: web corpora repeat whole paragraphs
(boilerplate disclaimers, licence blocks, quoted chain content) across
otherwise-distinct documents, and removing the *paragraph occurrences*
rather than whole documents recovers the unique prose.

All pure built-ins (split / posexplode / hash-agg / window-free
re-agg) — no Python in any hot path.

Scale shape (the 100 TB question):

* the paragraph table is the widest intermediate, but the frequency /
  first-owner aggregation shuffles only ``(pk, pl, doc_id)`` — a
  20-byte projected row — with map-side combine; paragraph *strings*
  are shuffled exactly once, on the same ``(pk, pl)`` key, and only
  for the reassembly path (`paragraph_dedup_clean`, where the output
  itself is text so shipping the bytes once is inherent);
* the dedup key is ``(xxhash64(para), length(para))`` — 12 bytes.
  Two distinct paragraphs silently merge only on a joint 64-bit-hash
  AND length collision (≈ n²/2⁶⁵ before the length factor); a merge
  only mis-marks a paragraph as duplicated, it cannot lose data.
  Corpora past ~10¹⁰ distinct paragraphs should widen to two seeded
  hashes (cf. the 128-bit url-keying option in ``pipeline.py``);
* skew: a boilerplate paragraph appearing in 10⁸ documents makes one
  hot reduce key, but the aggregations are all algebraic
  (count / min / count-distinct-by-first-level-agg), so map-side
  partial aggregation flattens it before the exchange — no star
  fallback needed, unlike LSH band groups which must materialize
  their member lists.

No counterpart in the reference (document-granularity sketches only);
engine addition in the spirit of its seen-shingle pruning
(`src/bloom/bloom-filter.ts` usage pattern), applied one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraphs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode documents into ``(id, pos, para)`` rows: newline-split
    (``\\r?\\n``, so CRLF corpora don't grow ``\\r``-suffixed phantom
    paragraphs), edge whitespace trimmed (space/tab/CR — ``F.trim``
    alone strips only ASCII space), empty lines dropped.  ``pos`` is
    the 0-based line index in the ORIGINAL text, so reassembly
    preserves source order even after filtering."""
    return (
        df.select(
            id_col, F.posexplode(F.split(F.col(text_col), "\r?\n"))
        )
        .select(
            id_col,
            F.col("pos"),
            F.regexp_replace(F.col("col"), r"^[ \t\r]+|[ \t\r]+$", "")
            .alias("para"),
        )
        .filter(F.col("para") != "")
    )


def _keyed(paras: DataFrame, id_col: str) -> DataFrame:
    return paras.select(
        id_col,
        "pos",
        "para",
        F.xxhash64("para").alias("pk"),
        F.length("para").alias("pl"),
    )


def paragraph_dup_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document paragraph-duplication metrics: ``n_paras``
    (non-empty lines), ``n_dup_paras`` (lines whose trimmed text occurs
    in >= 2 distinct documents), ``dup_ratio_ppm`` (exact integer
    parts-per-million, the cross-engine hash-safe encoding used by
    ``repetition_stats``).  Quality-filter form of paragraph dedup —
    rank/threshold documents by how much of them is corpus boilerplate.

    Every input document gets a row — a document with zero non-empty
    paragraphs (empty/whitespace-only) reports ``0/0/0`` rather than
    silently vanishing, matching :func:`paragraph_dedup_clean`'s
    every-doc contract (callers join these stats back per-doc).
    """
    keyed = _keyed(paragraphs(df, id_col, text_col), id_col)
    freq = (
        keyed.groupBy("pk", "pl")
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )
    agg = (
        keyed.select(id_col, "pk", "pl")
        .join(freq, ["pk", "pl"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(
                F.when(F.col("n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_paras"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_paras"), zero).alias("n_paras"),
            F.coalesce(F.col("n_dup_paras"), zero).alias("n_dup_paras"),
            F.coalesce(
                F.expr("n_dup_paras * 1000000 DIV n_paras"), zero
            ).alias("dup_ratio_ppm"),
        )
    )


def paragraph_dedup_clean(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep-first paragraph dedup: every distinct paragraph survives
    only in the document with the smallest id that contains it (all its
    occurrences there, so a doc is never half-deduped against itself);
    other documents lose that line.  Returns ``(id, clean_text)`` for
    EVERY input document — a document whose lines were all claimed
    elsewhere comes back as the empty string (downstream length filters
    then drop it), never silently disappears.

    Deterministic: first-owner = min id, reassembly ordered by original
    line position, newline-joined.
    """
    keyed = _keyed(paragraphs(df, id_col, text_col), id_col)
    first = keyed.groupBy("pk", "pl").agg(F.min(id_col).alias("first_id"))
    kept = keyed.join(first, ["pk", "pl"]).filter(
        F.col(id_col) == F.col("first_id")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        df.select(id_col)
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
