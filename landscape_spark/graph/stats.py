"""Scalar structure metrics of the link graph: reciprocity and degree
assortativity.

Both are one-row summary statistics a web-graph user computes alongside
the degree distribution: reciprocity (what fraction of hyperlinks are
mutual — the classic social-vs-hierarchical signal) and Newman's degree
assortativity (do high-degree pages link to high-degree pages? Web
graphs are famously disassortative, r < 0).

Both are pure aggregate plans: no iteration, no driver-side state, one
or two shuffles total. Published values are rounded to 6 decimals so the
floating divisions are engine-portable (the sums themselves are exact
integer arithmetic in doubles at any realistic edge count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.graph.cc import symmetrize


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_reciprocal, reciprocity): the fraction of
    directed edges (src, dst) whose reverse edge also exists. Self-loops
    are assumed absent (the edge derivation strips them); duplicate edges
    must be pre-deduped. Plan: one self-join on the reversed key pair +
    one global aggregate."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = edges.join(rev, on=["src", "dst"], how="left_semi")
    return (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(recip.agg(F.count(F.lit(1)).alias("n_reciprocal")))
        .select(
            "n_edges",
            "n_reciprocal",
            F.round(F.col("n_reciprocal") / F.col("n_edges"), 6).alias(
                "reciprocity"
            ),
        )
    )


def degree_assortativity(und_edges: DataFrame) -> DataFrame:
    """One row (n_vertices, n_edges, assortativity): Newman's degree
    assortativity coefficient on the UNDIRECTED graph — the Pearson
    correlation of the degrees at the two ends of each edge, each edge
    counted in both orientations (the symmetric convention, so both
    marginals are the same distribution and r is well defined).

    r = (E[xy] - E[x]E[y]) / (E[x^2] - E[x]^2)  over directed edge-end
    pairs (x = deg at one end, y = deg at the other). NULL (left as
    None) when the variance is 0 (e.g. a perfect matching or a cycle —
    every degree equal), matching the standard undefined-correlation
    convention. Plan: one degree aggregate, two joins to decorate edge
    ends, one global aggregate."""
    sym = symmetrize(und_edges)  # (v, w): each edge in both orientations
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        sym.join(deg.withColumnRenamed("deg", "dx"), on="v")
        .join(
            deg.select(F.col("v").alias("w"), F.col("deg").alias("dy")),
            on="w",
        )
        .select("dx", "dy")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    n_v = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    n_e = und_edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # symmetric pairs: E[x] == E[y] and E[x^2] == E[y^2], so the Pearson
    # denominator is just the variance of x
    cov = F.col("sxy") / F.col("m2") - (F.col("sx") / F.col("m2")) * (
        F.col("sx") / F.col("m2")
    )
    var = F.col("sxx") / F.col("m2") - (F.col("sx") / F.col("m2")) * (
        F.col("sx") / F.col("m2")
    )
    return (
        n_v.crossJoin(n_e)
        .crossJoin(agg)
        .select(
            "n_vertices",
            "n_edges",
            F.when(var > 0, F.round(cov / var, 6)).alias("assortativity"),
        )
    )
