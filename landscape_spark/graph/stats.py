"""Scalar structure metrics of the link graph: reciprocity, degree
assortativity, partition modularity, and the power-law degree exponent.

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


def modularity(und_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One row (n_communities, n_edges, modularity): Newman–Girvan
    modularity Q of a vertex partition over the UNDIRECTED graph —

        Q = sum_c [ m_c / m  -  ( d_c / (2m) )^2 ]

    (m = edge count, m_c = intra-community edges, d_c = total degree of
    community c). THE quality score for a community detection run — the
    gate composes it over the engine's own LPA output, closing the loop
    "detect communities, then score the partition".

    ``labels``: (v, label) covering every vertex (LPA's output shape).
    Vertices with degree 0 contribute nothing to either term; a partition
    on an edgeless graph yields NULL (m = 0, Q undefined). Plan: one
    degree aggregate, two label-decoration joins on the edge list, two
    community aggregates, one global fold — no iteration."""
    lab_a = labels.select(F.col("v").alias("a"), F.col("label").alias("la"))
    lab_b = labels.select(F.col("v").alias("b"), F.col("label").alias("lb"))
    decorated = und_edges.join(lab_a, on="a").join(lab_b, on="b")
    intra = (
        decorated.where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    sym = symmetrize(und_edges)
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    d_c = (
        labels.join(deg, on="v", how="left")
        .groupBy("label")
        .agg(F.coalesce(F.sum("deg"), F.lit(0)).alias("d_c"))
    )
    per_comm = d_c.join(intra, on="label", how="left").select(
        "label", "d_c", F.coalesce(F.col("m_c"), F.lit(0)).alias("m_c")
    )
    m = und_edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        per_comm.agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum("m_c").alias("s_mc"),
            F.sum(F.col("d_c") * F.col("d_c")).alias("s_dc2"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            "n_communities",
            "n_edges",
            F.when(
                F.col("n_edges") > 0,
                F.round(
                    F.col("s_mc") / F.col("n_edges")
                    - F.col("s_dc2")
                    / (4.0 * F.col("n_edges") * F.col("n_edges")),
                    6,
                ),
            ).alias("modularity"),
        )
    )


def degree_powerlaw_alpha(edges: DataFrame, dmin: int = 3) -> DataFrame:
    """One row (dmin, n_tail, alpha): continuous-MLE (Hill / Clauset–
    Shalizi–Newman eq. 3.1 with the standard −1/2 discreteness shift)
    estimate of the power-law exponent of the IN-degree tail —

        alpha = 1 + n_tail / sum_{d_i >= dmin} ln( d_i / (dmin - 0.5) )

    Web-graph in-degrees are the canonical power law (alpha ≈ 2.1 in
    Broder et al. WWW 2000); a curation pipeline watches this exponent to
    detect crawl skew. NULL when the tail is empty or degenerate (all
    tail degrees would need dmin >= 1; the log sum is > 0 whenever
    n_tail > 0 since d_i >= dmin > dmin - 0.5). Plan: one degree
    aggregate + one global fold — two shuffles, no iteration."""
    dmin = int(dmin)
    deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    tail = deg.where(F.col("deg") >= F.lit(dmin))
    return tail.agg(
        F.lit(dmin).alias("dmin"),
        F.count(F.lit(1)).alias("n_tail"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                1.0
                + F.count(F.lit(1))
                / F.sum(F.log(F.col("deg") / F.lit(dmin - 0.5))),
                6,
            ),
        ).alias("alpha"),
    )


def degree_percentiles(
    edges: DataFrame, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> DataFrame:
    """(q, value): exact discrete percentiles of the IN-degree
    distribution over linked-to vertices (zero-in-degree pages carry no
    row in the degree aggregate and are excluded — the convention of a
    distribution over observed degrees; value = smallest degree d whose
    cumulative vertex count reaches ceil(q * n), the lower/disc
    convention, integer-exact on both engines, no interpolation).

    Computed the scale-right way: NOT a global sort of n degree values —
    the degree aggregate collapses to the (degree, n_vertices) histogram
    first (at web scale a few thousand distinct degrees), and the
    cumulative window walks THAT small table. One degree shuffle + one
    histogram aggregate + a window over the tiny histogram."""
    from pyspark.sql import Window

    deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "deg", F.sum("cnt").over(w).alias("cum")
    )
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    out = None
    for q in qs:
        pick = (
            cum.crossJoin(F.broadcast(n))
            .where(F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")))
            .agg(F.min("deg").alias("value"))
            .select(F.lit(float(q)).alias("q"), "value")
        )
        out = pick if out is None else out.unionAll(pick)
    return out


def avg_neighbor_degree(und_edges: DataFrame) -> DataFrame:
    """(deg, n_vertices, knn): Pastor-Satorras degree-correlation curve —
    for each degree class k, the mean over degree-k vertices of their
    neighbors' mean degree. THE standard plot beside assortativity (web
    graphs: decreasing knn(k) = disassortative hubs). Plan: one degree
    aggregate, one edge-end decoration join, two nested means — three
    shuffles, no iteration. knn rounded to 6 decimals."""
    sym = symmetrize(und_edges)
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    per_v = (
        sym.join(
            deg.select(F.col("v").alias("w"), F.col("deg").alias("dw")), on="w"
        )
        .groupBy("v")
        .agg(F.avg("dw").alias("nbr_avg"))
        .join(deg, on="v")
    )
    return per_v.groupBy("deg").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.round(F.avg("nbr_avg"), 6).alias("knn"),
    )
