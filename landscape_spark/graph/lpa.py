"""Synchronous label propagation (community detection) — deterministic.

North-rule addition. Tie-break is fully deterministic so results are
reproducible and SQL-oracle-checkable: each round a vertex adopts the label
with the HIGHEST count among its neighbors' labels, ties broken by SMALLEST
label; isolated vertices keep their own label. Fixed iteration count
(synchronous rounds), labels init to vertex id.

Scale: one shuffle per round (groupBy (v,label) count) plus a window over v —
the window partitions by vertex so it rides the same hash partitioning; AQE
coalesces. Deterministic by construction (no hash-order dependence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landscape_spark.graph.cc import symmetrize


def label_propagation(
    und_edges: DataFrame,
    vertices: DataFrame,
    iters: int = 5,
) -> DataFrame:
    """Return (v, label) after ``iters`` synchronous LPA rounds."""
    sym = symmetrize(und_edges)
    labels = vertices.select("v", F.col("v").alias("label")).localCheckpoint(eager=True)
    w = Window.partitionBy("v").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iters):
        nbr_labels = sym.join(labels, sym.w == labels.v).select(
            sym.v.alias("v"), "label"
        )
        best = (
            nbr_labels.groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("v", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, on="v", how="left")
            .select("v", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels
