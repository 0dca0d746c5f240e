"""PageRank — power iteration with damping and dangling-mass redistribution.

North-rule addition (not in the reference engine, which is connectivity-only;
required by BASELINE.json north_rule). Semantics fixed so the DuckDB oracle
can reproduce them bit-for-bit up to float-summation order:

    r_0(v)   = 1/N
    r_t+1(v) = (1-d)/N + d * ( sum_{u->v} r_t(u)/outdeg(u) + dangling_t/N )
    dangling_t = sum of r_t(u) over u with outdeg(u) = 0

Scale design: edges join ranks on src (sort-merge at scale; AQE handles hub
skew via skew-join splitting), groupBy dst partial+final aggregation
(map-side combine is automatic for F.sum), the per-vertex degree table is
joined ONCE up front and the (src, dst, out_deg) relation is cached so each
iteration is exactly one shuffle. Dangling mass is a scalar treeAggregate
(2-row exchange), not a join. Lineage cut with localCheckpoint each iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    n_vertices: int,
    iters: int = 20,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """Return (v, pr_score) after ``iters`` synchronous power iterations
    (or earlier if ``tol`` given and max |delta| < tol).

    edges: directed distinct (src, dst). vertices: (v), dense 0..N-1.
    """
    n = float(n_vertices)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ew = edges.join(deg, on="src").select("src", "dst", "out_deg").cache()
    ew.count()  # materialize once; every iteration reuses this

    ranks = vertices.select("v", F.lit(1.0 / n).alias("r")).localCheckpoint(eager=True)
    has_out = deg.select(F.col("src").alias("v"), F.lit(True).alias("_has_out"))

    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.v)
            .select(F.col("dst").alias("v"), (F.col("r") / F.col("out_deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        # dangling mass as a 1-row DF folded into the plan (no driver collect:
        # the whole iteration is ONE job triggered by the checkpoint)
        dangling_df = (
            ranks.join(F.broadcast(has_out), on="v", how="left")
            .where(F.col("_has_out").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("_dang"))
        )
        new_ranks = (
            vertices.join(contrib, on="v", how="left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dang") / F.lit(n))
                ).alias("r"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("r", "r_old"), on="v")
                .agg(F.max(F.abs(F.col("r") - F.col("r_old"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    ew.unpersist()
    return ranks.select("v", F.col("r").alias("pr_score"))
