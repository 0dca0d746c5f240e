"""SALSA — Stochastic Approach for Link-Structure Analysis.

Lempel & Moran (WWW 2000): HITS's mutual reinforcement replaced by two
random walks on the bipartite hub/authority view of the link graph — the
algorithm behind large-scale who-to-follow / related-page systems
(Gupta et al., WWW 2013 run it at full social-graph scale). Authority
walk step: from authority j step BACK to a uniform in-linking hub, then
FORWARD to a uniform out-link of that hub:

    b_t(i)   = sum_{j : i->j} a_t(j) / indeg(j)
    a_{t+1}(k) = sum_{i : i->k} b_t(i) / outdeg(i)

and symmetrically for hub scores on the reversed walk. Both walks
CONSERVE mass exactly (each half-step redistributes scores through a
stochastic matrix), so no per-iteration normalization is needed — the
fixed-iteration partial sums are reproduced by the unrolled SQL oracle
bit-for-bit up to float-summation order. Initial mass is uniform over
the walkable side (authorities = vertices with in-links, hubs = vertices
with out-links); unreachable vertices hold score 0.

Plan discipline mirrors graph/hits.py: the degree-decorated edge
relation is repartitioned + cached once per orientation; each half-step
is one hash join + one map-side-combined aggregate (one real shuffle),
no vertex-sized broadcast, lineage cut per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.session import local_parallelism


def salsa(
    edges: DataFrame,
    vertices: DataFrame,
    iters: int = 10,
) -> DataFrame:
    """Return (v, authority, hub) after ``iters`` full SALSA walk steps.

    edges: directed distinct (src, dst); vertices: (v)."""
    spark = edges.sparkSession
    p = local_parallelism(spark)
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = (
        edges.join(indeg, on="dst")
        .join(outdeg, on="src")
        .select("src", "dst", "indeg", "outdeg")
        .repartition(p, "src")
        .cache()
    )
    ew.count()

    def _walk(score_key: str, back_key: str, back_deg: str, fwd_deg: str):
        """One conserved two-hop walk iterated ``iters`` times; returns the
        final score frame (v, s) over the walkable side."""
        side = (
            ew.select(F.col(score_key).alias("v")).distinct()
        )
        n_side = side.count()
        s = side.select(
            "v", F.lit(1.0 / float(n_side)).alias("s")
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            back = (
                ew.join(s, ew[score_key] == s.v)
                .select(
                    F.col(back_key).alias("u"),
                    (F.col("s") / F.col(back_deg)).alias("c"),
                )
                .groupBy("u")
                .agg(F.sum("c").alias("b"))
            )
            s = (
                ew.join(back, ew[back_key] == back.u)
                .select(
                    F.col(score_key).alias("v"),
                    (F.col("b") / F.col(fwd_deg)).alias("c"),
                )
                .groupBy("v")
                .agg(F.sum("c").alias("s"))
                .localCheckpoint(eager=True)
            )
        return s

    auth = _walk("dst", "src", "indeg", "outdeg")
    hub = _walk("src", "dst", "outdeg", "indeg")
    out = (
        vertices.join(auth.select("v", F.col("s").alias("authority")), on="v", how="left")
        .join(hub.select("v", F.col("s").alias("hub")), on="v", how="left")
        .select(
            "v",
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )
    ew.unpersist()
    return out
