"""PageRank — power iteration with damping and dangling-mass redistribution.

North-rule addition (not in the reference engine, which is connectivity-only;
required by BASELINE.json north_rule). Semantics fixed so the DuckDB oracle
can reproduce them bit-for-bit up to float-summation order:

    r_0(v)   = 1/N
    r_t+1(v) = (1-d)/N + d * ( sum_{u->v} r_t(u)/outdeg(u) + dangling_t/N )
    dangling_t = sum of r_t(u) over u with outdeg(u) = 0

Scale design: edges join ranks on src (sort-merge at scale; AQE handles hub
skew via skew-join splitting), groupBy dst partial+final aggregation
(map-side combine is automatic for F.sum). The (src, dst, out_deg) relation
is joined ONCE up front, repartitioned by src and cached, so its shuffle is
paid once and the per-iteration join reuses the cached partitioning. The
dangling-vertex SET is static across iterations, so it is computed once and
carried as a boolean column of the rank table — the dangling mass is then a
plain filtered aggregate of the checkpointed ranks (a 1-row broadcast), with
NO per-iteration O(n) join or broadcast anywhere in the loop (at 10^9
vertices a per-iteration vertex-set broadcast is a driver OOM). Each
iteration is exactly one eager job (the localCheckpoint) containing one
shuffle (the contrib groupBy).
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
    spark = edges.sparkSession
    num_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ew = (
        edges.join(deg, on="src")
        .select("src", "dst", "out_deg")
        .repartition(num_part, "src")
        .cache()
    )
    ew.count()  # materialize once; every iteration reuses this partitioning

    # static dangling flag: outdeg(v) = 0. Computed ONCE, carried through the
    # rank table so the per-iteration dangling mass is a filtered sum of
    # ranks — never a join against a vertex-sized side.
    vstate = (
        vertices.join(
            deg.select(F.col("src").alias("v"), F.lit(True).alias("_o")),
            on="v",
            how="left",
        )
        .select("v", F.col("_o").isNull().alias("is_dang"))
        .localCheckpoint(eager=True)
    )
    ranks = vstate.select("v", F.lit(1.0 / n).alias("r"), "is_dang").localCheckpoint(
        eager=True
    )

    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.v)
            .select(F.col("dst").alias("v"), (F.col("r") / F.col("out_deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        # dangling mass as a 1-row DF folded into the plan (no driver
        # collect: the whole iteration is ONE job triggered by the
        # checkpoint, and this side is a scan of the already-checkpointed
        # ranks — no join, no O(n) exchange)
        dangling_df = ranks.where("is_dang").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("_dang")
        )
        new_ranks = (
            vstate.join(contrib, on="v", how="left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dang") / F.lit(n))
                ).alias("r"),
                "is_dang",
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("v", F.col("r").alias("r_old")), on="v"
                )
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
