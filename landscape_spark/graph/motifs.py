"""Four-cycle (rectangle) counting — the next motif up from triangles.

Web-graph motif operator (webtext/link-graph axes; the reference engine
is connectivity-only). Rectangles (C4 subgraphs, chords allowed) are the
classic link-farm / co-citation signal: two pages sharing two or more
common neighbors form rectangles, and spam clusters light up in the
rectangle density long before they show in the triangle count (bipartite
link farms have ZERO triangles but huge rectangle counts — the
"butterfly" of the bipartite-counting literature, Wang et al. VLDB'19).

Counting identity: for each unordered endpoint pair (a < b), let
cnt(a,b) = |N(a) ∩ N(b)| (the number of wedges with endpoints {a,b}).
Every 4-cycle a-c1-b-c2 contributes C(2,2)=1 at its diagonal pair (a,b)
and 1 at (c1,c2), so

    n_rectangles = sum_pairs C(cnt, 2) / 2 = sum_pairs cnt*(cnt-1) / 4

with the division exact in integers. Plan: one wedge self-join through
the shared neighbor (the triangle/linkpred join), one map-side-combined
pair aggregate, one global sum — two shuffles total, no iteration.

Scale: a degree-D hub center admits C(D,2) wedges; ``max_center_degree``
is the documented 100TB knob (drop wedges whose CENTER exceeds the cap
— the count becomes a lower bound over the hub-free core, the standard
mitigation in the butterfly literature). The gate runs uncapped (exact);
the cap's monotone-containment property is unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.graph.cc import symmetrize


def rectangle_count(
    und_edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """One row (n_wedge_pairs, n_rectangles) over canonical undirected
    edges (a, b), a < b. n_wedge_pairs = number of endpoint pairs with at
    least one wedge (the candidate-pair volume a co-citation analysis
    would materialize)."""
    sym = symmetrize(und_edges)
    centers = sym
    if max_center_degree is not None:
        deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        centers = sym.join(
            deg.where(F.col("deg") <= F.lit(int(max_center_degree))).select("v"),
            on="v",
            how="left_semi",
        )
    left = centers.select("v", F.col("w").alias("a"))
    right = centers.select("v", F.col("w").alias("b"))
    pairs = (
        left.join(right, on="v")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_wedge_pairs"),
        F.expr(
            "CAST(COALESCE(SUM(cnt * (cnt - 1)), 0) DIV 4 AS BIGINT)"
        ).alias("n_rectangles"),
    )
