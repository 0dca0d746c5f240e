"""Deterministic random-walk sampling + skip-gram pair extraction.

The graph-embedding side of a training-data pipeline (DeepWalk, KDD'14 /
node2vec p=q=1): generate fixed-length first-order random walks from
every vertex, then explode them into (center, context) skip-gram pairs —
the positive-pair corpus an embedding trainer consumes. On a link graph
this is also the crawl-simulation primitive (PageRank's surfer, sampled).

Determinism is a feature, not a shortcut: the next hop from vertex v at
position ``step`` of walk (start_v, walk) is adjacency rank

    key  = start_v * 2^20 + walk
    H = ((v mod P)*131071 + step*8191 + (key mod P)*524287 + 12289) mod P
    rank = H mod out_deg(v)          with P = 9_999_991 (prime)

(the inner mods keep every product under 2^53 — overflow-free int64 in
both engines at any vertex count)

over the dst-sorted adjacency — a fixed public LCG-style law both engines
evaluate exactly in int64 (no RNG state, so the output is reproducible,
partition-invariant, and resumable; swap the law for xxhash64 when
cryptographic-quality mixing matters more than SQL portability). Walks
stop early at dangling vertices (no out-links), the standard convention.

Plan shape: the ranked adjacency (src, rank, dst, out_deg) is built ONCE
with a per-src window (partitioned by src — never a global window) and
cached; each step resolves the hop rank with a vertex-keyed degree join,
then fetches the chosen neighbor via an EQUI-join on (src, rank) — one
matching adjacency row per walker, NO per-hub fan-out (see the in-loop
comment for the 10^12-row failure mode the equi-key avoids). Lineage is
cut per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from landscape_spark.session import local_parallelism

# the public hop law — mirrored verbatim in the DuckDB oracle SQL
H_V, H_STEP, H_WALK, H_ADD, H_MOD = 131071, 8191, 524287, 12289, 9_999_991
WALK_SHIFT = 1 << 20  # composite walk id = start_v * WALK_SHIFT + walk


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """(src, rank, dst, out_deg): dst-sorted dense ranks 0..out_deg-1 per
    source. The window partitions by src (each source's adjacency sorts
    locally — hub out-degrees on page graphs are bounded by page size)."""
    w = Window.partitionBy("src").orderBy("dst")
    return edges.select(
        "src",
        (F.row_number().over(w) - 1).alias("rank"),
        "dst",
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("out_deg"),
    )


def _hop_rank(v, step: int, walk_key):
    h = (
        (v % F.lit(H_MOD)) * F.lit(H_V)
        + F.lit(int(step) * H_STEP)
        + (walk_key % F.lit(H_MOD)) * F.lit(H_WALK)
        + F.lit(H_ADD)
    ) % F.lit(H_MOD)
    return h


def random_walks(
    edges: DataFrame,
    vertices: DataFrame,
    walk_len: int = 6,
    walks_per_vertex: int = 2,
) -> DataFrame:
    """(start_v, walk, step, v): ``walks_per_vertex`` deterministic walks
    of up to ``walk_len`` hops from every vertex (step 0 = the start
    itself; walks truncate at dangling vertices)."""
    spark = edges.sparkSession
    p = local_parallelism(spark)
    adj = ranked_adjacency(edges).repartition(p, "src", "rank").cache()
    adj.count()
    deg = adj.select("src", "out_deg").distinct().cache()
    deg.count()

    state = vertices.select(
        F.col("v").alias("start_v"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(walks_per_vertex) - 1))
        ).alias("_wk"),
    ).select(
        "start_v",
        F.col("_wk").cast("long").alias("walk"),
        F.lit(0).alias("step"),
        F.col("start_v").alias("v"),
    )
    state = state.localCheckpoint(eager=True)
    levels = [state]
    for t in range(1, int(walk_len) + 1):
        walk_key = F.col("start_v") * F.lit(WALK_SHIFT) + F.col("walk")
        h = _hop_rank(F.col("v"), t - 1, walk_key)
        # resolve the hop rank BEFORE touching the adjacency, then fetch
        # the chosen neighbor with an EQUI-join on (src, rank): joining on
        # src alone and post-filtering the rank equation would fan each
        # walker at a degree-D hub out to D intermediate rows — 10^6
        # walkers parked on a 10^6-degree hub is a 10^12-row join. The
        # degree lookup is a plain vertex-keyed hash join (no fan-out).
        picked = (
            state.join(deg, deg.src == state.v)
            .select(
                "start_v",
                "walk",
                F.col("v").alias("src"),
                (h % F.col("out_deg")).alias("rank"),
            )
        )
        nxt = (
            picked.join(adj.select("src", "rank", "dst"), on=["src", "rank"])
            .select(
                "start_v",
                "walk",
                F.lit(t).alias("step"),
                F.col("dst").alias("v"),
            )
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        state = nxt
        if nxt.isEmpty():
            break
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    adj.unpersist()
    deg.unpersist()
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs): ordered co-occurrence counts within
    ``window`` positions along each walk — the positive-pair corpus for an
    embedding trainer. One self-join per walk key band + one aggregate
    (the join key is the walk id; the step-window predicate filters the
    bounded per-walk fan-out, <= walk_len rows per key)."""
    a = walks.select(
        "start_v", "walk", F.col("step").alias("s1"), F.col("v").alias("center")
    )
    b = walks.select(
        "start_v", "walk", F.col("step").alias("s2"), F.col("v").alias("context")
    )
    return (
        a.join(b, on=["start_v", "walk"])
        .where(
            (F.col("s2") > F.col("s1"))
            & (F.col("s2") - F.col("s1") <= F.lit(int(window)))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
