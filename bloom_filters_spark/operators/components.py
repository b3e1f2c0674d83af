"""Connected components via iterative hash-min label propagation.

Catalyst has no fixpoint operator (SURVEY.md §4.3), so the loop lives on
the driver: each iteration propagates the current minimum label across
edges and keeps the elementwise min; ``localCheckpoint`` truncates
lineage every iteration.  Dedup clusters are star-like → expect <= ~5
iterations; ``max_iter`` caps pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """edges(id1, id2) → (doc_id, cluster_id = min id in component).

    If ``vertices`` is given (one column ``id_col``), isolated vertices
    appear in the output as their own singleton cluster.
    """
    sym = edges.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionByName(edges.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint()

    labels = (
        sym.select(F.col("src").alias(id_col))
        .distinct()
        .withColumn("label", F.col(id_col))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # min label among each vertex's neighbors
        msgs = (
            sym.join(labels, sym.src == labels[id_col])
            .groupBy(F.col("dst").alias(id_col))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(msgs, id_col, "left")
            .select(
                id_col,
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint()  # one materialization per iteration
        )
        has_changes = (
            len(stepped.filter(F.col("label") < F.col("old_label")).take(1)) > 0
        )
        labels = stepped.select(id_col, "label")
        if not has_changes:
            break

    out = labels.select(id_col, F.col("label").alias("cluster_id"))
    if vertices is not None:
        out = (
            vertices.select(id_col)
            .join(out, id_col, "left")
            .select(
                id_col,
                F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            )
        )
    return out
