"""Connected components via Boruvka emulation over l0-sketch supernodes.

The reference's query path (/root/reference/src/graph_distrib_update.cpp:
105-154): <= O(log n) rounds; per round, sample one incident (cut) edge per
live supernode, union endpoint components in a DSU, merge the supernodes of
each component linearly, repeat. Our Spark rendition:

* supernodes live in a DISTRIBUTED sketch table keyed by component (the
  reference holds them all on rank 0 — its scalability ceiling, which this
  design removes);
* per round: vectorized sample over the table (group r consumed, one-shot),
  tiny (<= live-components rows) sample set joined against the vid->comp map
  to resolve endpoints, COLLECTED to the driver for DSU union (the reference
  also runs Boruvka unions on one node; our collected set shrinks
  geometrically),
* remap broadcast back, sketches XOR-merged by new component (one bounded
  shuffle over ever-shrinking data — the 'cluster merge tree' analog),
* vid->comp map updated via broadcast join; localCheckpoint cuts lineage.

Component labels are canonical min-vertex-ids, so results compare exactly
against the min-label oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.sketch.build import (
    build_sketch_table,
    sample_table,
    xor_merge_by_key,
)
from landscape_spark.sketch.l0 import SketchParams


class DSU:
    """Union-find with union-by-min (roots are component minima)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.get(x, x)
        if p == x:
            return x
        r = self.find(p)
        self.parent[x] = r
        return r

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo
        return True


def connected_components_sketch(
    spark: SparkSession,
    und_edges: DataFrame,
    n: int,
    params: SketchParams | None = None,
    num_partitions: int = 32,
    on_round=None,
) -> DataFrame:
    """Return (v, comp) with comp = min vertex id of v's component.

    und_edges: canonical (a, b), a<b. Isolated vertices (no edges) are their
    own components; they never enter the sketch table and keep comp=v.
    """
    params = params or SketchParams.for_graph(n)
    sketches = build_sketch_table(und_edges, params, num_partitions)
    # component-keyed supernodes; initially comp == vid
    comp_sketch = sketches.withColumnRenamed("vid", "comp").localCheckpoint(eager=True)
    # vid -> comp map (only vertices with incident edges need tracking)
    vmap = (
        und_edges.select(F.col("a").alias("v"))
        .unionAll(und_edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("comp"))
        .localCheckpoint(eager=True)
    )
    dsu = DSU()

    for g in range(params.rounds):
        samples = sample_table(comp_sketch, "comp", g, params)
        # resolve sampled edge endpoints to their current components
        u_map = vmap.select(F.col("v").alias("u"), F.col("comp").alias("comp_u"))
        v_map = vmap.select(F.col("v").alias("v2"), F.col("comp").alias("comp_v"))
        resolved = (
            samples.join(u_map, on="u").join(v_map, samples.v == v_map.v2)
            .select("comp_u", "comp_v")
            .collect()
        )
        merged_any = False
        for row in resolved:
            if dsu.union(row.comp_u, row.comp_v):
                merged_any = True
        if on_round is not None:
            on_round(g, len(resolved), merged_any)
        if not merged_any:
            if not resolved:
                break  # no component produced a cut edge: done (or sketches dry)
            continue
        # broadcast remap of changed roots
        remap = [(c, dsu.find(c)) for c in list(dsu.parent.keys())]
        remap_df = F.broadcast(
            spark.createDataFrame(remap, "old_comp long, new_comp long")
        )
        comp_sketch = (
            comp_sketch.join(remap_df, comp_sketch.comp == remap_df.old_comp, "left")
            .select(
                F.coalesce("new_comp", "comp").alias("comp"), "sketch"
            )
        )
        comp_sketch = xor_merge_by_key(comp_sketch, "comp", num_partitions).localCheckpoint(
            eager=True
        )
        vmap = (
            vmap.join(remap_df, vmap.comp == remap_df.old_comp, "left")
            .select("v", F.coalesce("new_comp", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    return vmap


def components_with_isolated(
    spark: SparkSession, vmap: DataFrame, vertices: DataFrame
) -> DataFrame:
    """Extend the edge-incident vid->comp map to all vertices (isolated
    vertices are singleton components)."""
    return vertices.join(vmap, on="v", how="left").select(
        "v", F.coalesce("comp", F.col("v")).alias("comp")
    )
