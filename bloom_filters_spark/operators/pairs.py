"""Candidate-pair generation from LSH bands, with hot-band skew control.

Strategy (SURVEY.md §4.3): one shuffle computes per-(band_id, band_hash)
group size + min doc id (window over the band key); then

* groups with size <= max_band_group emit ALL within-group pairs via a
  self-equi-join (SortMergeJoin/ShuffledHashJoin on the band key, AQE
  skew-split eligible),
* oversized groups (boilerplate bands — whp near-identical docs) emit
  STAR pairs (anchor = min doc id) — O(n) instead of O(n²) while
  preserving connectivity for clustering.

Pairs are deduped across bands with dropDuplicates — the verify stage
then sees each candidate once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BAND_KEY = ["band_id", "band_hash"]


def candidate_pairs(bands: DataFrame, max_band_group: int = 64,
                    id_col: str = "doc_id") -> DataFrame:
    """bands(band_id, band_hash, doc_id) → pairs(id1, id2), id1 < id2."""
    w = Window.partitionBy(*BAND_KEY)
    sized = bands.withColumn("grp_n", F.count(F.lit(1)).over(w)).withColumn(
        "grp_min", F.min(id_col).over(w)
    )
    # drop singleton groups immediately — they can't produce pairs
    sized = sized.filter(F.col("grp_n") >= 2)

    small = sized.filter(F.col("grp_n") <= max_band_group).select(
        *BAND_KEY, F.col(id_col)
    )
    left = small.select(*BAND_KEY, F.col(id_col).alias("id1"))
    right = small.select(*BAND_KEY, F.col(id_col).alias("id2"))
    small_pairs = left.join(right, BAND_KEY).where(F.col("id1") < F.col("id2"))

    star_pairs = (
        sized.filter(F.col("grp_n") > max_band_group)
        .where(F.col(id_col) != F.col("grp_min"))
        .select(F.col("grp_min").alias("id1"), F.col(id_col).alias("id2"))
    )

    return (
        small_pairs.select("id1", "id2")
        .unionByName(star_pairs)
        .dropDuplicates(["id1", "id2"])
    )
