"""Boruvka emulation over l0-sketch supernodes: CC, k-spanning-forests, point queries.

The reference's query paths:
* CC (/root/reference/src/graph_distrib_update.cpp:105-154): <= O(log n)
  rounds; per round sample one incident (cut) edge per live supernode, union
  endpoint components in a DSU, merge the supernodes of each component
  linearly, repeat.
* k spanning forests (:156-209): k Boruvka passes; after each pass the
  forest's edges are RE-INSERTED into both endpoint supernodes — XOR is
  self-inverse, so re-insertion deletes them from the linear sketch — and the
  next pass extracts an edge-disjoint forest. The union of k forests is a
  k-edge-connectivity certificate (test /root/reference/test/k_connectivity_test.cpp:6-30).
* point query (:211-258): root comparison on the cached DSU.

Spark rendition: supernodes live in a DISTRIBUTED sketch table (the reference
holds them all on rank 0 — its acknowledged ceiling, which this removes);
samples per round are <= live components, joined to the vid->comp map and
collected for driver DSU; remaps broadcast back; sketches XOR-merged by new
component (bounded shuffle over geometrically-shrinking data). Each Boruvka
round consumes one sketch GROUP (one-shot sampling), so k-forest extraction
budgets rounds_per_forest groups per pass via ``start_group``.

Component labels are canonical min-vertex-ids — exactly comparable to the
min-label SQL oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.sketch.build import (
    build_sketch_table,
    sample_table,
    xor_merge_by_key,
)
from landscape_spark.sketch.l0 import SketchParams, build_sketches, edge_code, to_bytes


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


def _boruvka_pass(
    spark: SparkSession,
    vid_sketches: DataFrame,
    vmap: DataFrame,
    params: SketchParams,
    start_group: int,
    max_groups: int,
    num_partitions: int,
    on_round=None,
    ckpt=None,
    resume_state: dict | None = None,
) -> tuple[DataFrame, list[tuple[int, int]], int]:
    """One full Boruvka emulation starting from per-VERTEX sketches.

    Returns (final vid->comp map, forest edges accepted, groups consumed).
    If ``ckpt`` (a RoundCheckpointer) is given, every round persists
    (comp_sketch, vmap) parquet + DSU state + per-partition lineage; pass the
    loaded state back via resume_connected_components to continue mid-query.
    """
    import time as _time

    dsu = DSU()
    forest: list[tuple[int, int]] = []
    groups_used = 0
    if resume_state is not None:
        comp_sketch = resume_state["comp_sketch"].localCheckpoint(eager=True)
        vmap = resume_state["vmap"].localCheckpoint(eager=True)
        dsu.parent = {int(k): int(v) for k, v in resume_state["dsu"].items()}
        forest = [tuple(e) for e in resume_state["forest"]]
        start_group = resume_state["next_group"]
    else:
        comp_sketch = vid_sketches.withColumnRenamed("vid", "comp").localCheckpoint(
            eager=True
        )
    for g in range(start_group, min(start_group + max_groups, params.rounds)):
        groups_used += 1
        _t0 = _time.time()
        samples = sample_table(comp_sketch, "comp", g, params)
        u_map = vmap.select(F.col("v").alias("u"), F.col("comp").alias("comp_u"))
        v_map = vmap.select(F.col("v").alias("v2"), F.col("comp").alias("comp_v"))
        resolved = (
            samples.join(u_map, on="u")
            .join(v_map, samples.v == v_map.v2)
            .select("u", "v", "comp_u", "comp_v")
            .collect()
        )
        merged_any = False
        touched: set[int] = set()
        for row in resolved:
            if dsu.union(row.comp_u, row.comp_v):
                merged_any = True
                touched.add(row.comp_u)
                touched.add(row.comp_v)
                forest.append((min(row.u, row.v), max(row.u, row.v)))
        if on_round is not None:
            on_round(g, len(resolved), merged_any)
        if not merged_any:
            if not resolved:
                break  # no component produced a cut edge: converged (or dry)
            continue
        # remap ONLY this round's touched components (including absorbing
        # roots mapping to themselves, so their rows enter the XOR-merge
        # group); everything untouched passes through with ZERO shuffle —
        # per-round merge traffic is O(components merged), which shrinks
        # geometrically, not O(all supernodes).
        remap = [(c, dsu.find(c)) for c in sorted(touched)]
        remap_df = F.broadcast(
            spark.createDataFrame(remap, "old_comp long, new_comp long")
        )
        joined = comp_sketch.join(
            remap_df, comp_sketch.comp == remap_df.old_comp, "left"
        )
        unchanged = joined.where(F.col("new_comp").isNull()).select("comp", "sketch")
        changed = joined.where(F.col("new_comp").isNotNull()).select(
            F.col("new_comp").alias("comp"), "sketch"
        )
        comp_sketch = unchanged.unionAll(
            xor_merge_by_key(changed, "comp", num_partitions)
        ).localCheckpoint(eager=True)
        vmap = (
            vmap.join(remap_df, vmap.comp == remap_df.old_comp, "left")
            .select("v", F.coalesce("new_comp", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        if ckpt is not None:
            ckpt.save_round(
                g,
                {"comp_sketch": comp_sketch, "vmap": vmap},
                {
                    "dsu": {str(k): v for k, v in dsu.parent.items()},
                    "forest": forest,
                    "next_group": g + 1,
                    "params": {
                        "n": params.n,
                        "rounds": params.rounds,
                        "cols": params.cols,
                        "depths": params.depths,
                        "seed": params.seed,
                    },
                },
                {"samples": len(resolved), "round_sec": round(_time.time() - _t0, 3)},
            )
    return vmap, forest, groups_used


def _initial_vmap(und_edges: DataFrame) -> DataFrame:
    return (
        und_edges.select(F.col("a").alias("v"))
        .unionAll(und_edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("comp"))
        .localCheckpoint(eager=True)
    )


def connected_components_sketch(
    spark: SparkSession,
    und_edges: DataFrame,
    n: int,
    params: SketchParams | None = None,
    num_partitions: int = 32,
    on_round=None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (v, comp), comp = min vertex id of v's component. Isolated
    vertices never enter the sketch table; extend with components_with_isolated.
    With checkpoint_dir, every round persists state + lineage (resumable via
    resume_connected_components)."""
    params = params or SketchParams.for_graph(n)
    ckpt = None
    if checkpoint_dir is not None:
        from landscape_spark.checkpoint import RoundCheckpointer

        ckpt = RoundCheckpointer(spark, checkpoint_dir, "boruvka_cc")
    sketches = build_sketch_table(und_edges, params, num_partitions)
    vmap, _, _ = _boruvka_pass(
        spark,
        sketches,
        _initial_vmap(und_edges),
        params,
        start_group=0,
        max_groups=params.rounds,
        num_partitions=num_partitions,
        on_round=on_round,
        ckpt=ckpt,
    )
    return vmap


def resume_connected_components(
    spark: SparkSession,
    checkpoint_dir: str,
    num_partitions: int = 32,
    on_round=None,
) -> DataFrame:
    """Resume a checkpointed Boruvka CC mid-iteration: load the latest round's
    (comp_sketch, vmap, DSU, next group) and continue to convergence."""
    from landscape_spark.checkpoint import RoundCheckpointer

    ckpt = RoundCheckpointer(spark, checkpoint_dir, "boruvka_cc")
    latest = ckpt.latest_round()
    if latest is None:
        raise ValueError(f"no completed rounds under {checkpoint_dir}")
    dfs, lineage = ckpt.load_round(latest)
    p = lineage["state"]["params"]
    params = SketchParams(
        n=p["n"], rounds=p["rounds"], cols=p["cols"], depths=p["depths"], seed=p["seed"]
    )
    resume_state = {
        "comp_sketch": dfs["comp_sketch"],
        "vmap": dfs["vmap"],
        "dsu": lineage["state"]["dsu"],
        "forest": lineage["state"]["forest"],
        "next_group": lineage["state"]["next_group"],
    }
    vmap, _, _ = _boruvka_pass(
        spark,
        None,
        None,
        params,
        start_group=resume_state["next_group"],
        max_groups=params.rounds,
        num_partitions=num_partitions,
        on_round=on_round,
        ckpt=ckpt,
        resume_state=resume_state,
    )
    return vmap


def k_spanning_forests(
    spark: SparkSession,
    und_edges: DataFrame,
    n: int,
    k: int,
    seed: int = 42,
    num_partitions: int = 32,
) -> DataFrame:
    """k edge-disjoint spanning forests (k-edge-connectivity certificate).

    Returns DataFrame (forest_id int, a long, b long). Forest t is a spanning
    forest of the graph minus forests 0..t-1 (XOR re-insertion deletes used
    edges from the linear sketches, graph_distrib_update.cpp:180-183).
    Sketch-space budget scales with k, mirroring sketches_factor(k)
    (graph_distrib_update.cpp:11-14,25).
    """
    lg = max(1, int(np.ceil(np.log2(max(n, 2)))))
    per_pass = 2 * lg + 4
    params = SketchParams(n=n, rounds=k * per_pass, cols=4, depths=lg + 4, seed=seed)
    vid_sketches = build_sketch_table(und_edges, params, num_partitions).localCheckpoint(
        eager=True
    )
    out_rows: list[tuple[int, int, int]] = []
    group_cursor = 0
    for t in range(k):
        vmap, forest, used = _boruvka_pass(
            spark,
            vid_sketches,
            _initial_vmap(und_edges),
            params,
            start_group=group_cursor,
            max_groups=per_pass,
            num_partitions=num_partitions,
        )
        group_cursor += used
        if not forest:
            break
        out_rows.extend((t, a, b) for a, b in forest)
        if t == k - 1:
            break
        # delete forest edges: XOR their codes back into BOTH endpoint
        # supernodes (self-inverse), via a small delta sketch table.
        fa = np.array([a for a, _ in forest], dtype=np.int64)
        fb = np.array([b for _, b in forest], dtype=np.int64)
        codes = edge_code(fa, fb, params.n)
        vids = np.concatenate([fa, fb])
        cc = np.concatenate([codes, codes])
        dvids, dsk = build_sketches(vids, cc, params)
        delta_df = spark.createDataFrame(
            list(zip([int(x) for x in dvids], to_bytes(dsk))), "vid long, sketch binary"
        )
        vid_sketches = xor_merge_by_key(
            vid_sketches.unionAll(delta_df), "vid", num_partitions
        ).localCheckpoint(eager=True)
    if not out_rows:
        return spark.createDataFrame([], "forest_id int, a long, b long")
    return spark.createDataFrame(out_rows, "forest_id int, a long, b long")


def components_with_isolated(
    spark: SparkSession, vmap: DataFrame, vertices: DataFrame
) -> DataFrame:
    """Extend the edge-incident vid->comp map to all vertices (isolated
    vertices are singleton components)."""
    return vertices.join(vmap, on="v", how="left").select(
        "v", F.coalesce("comp", F.col("v")).alias("comp")
    )


def point_to_point_query(cc_result: DataFrame, a: int, b: int) -> bool:
    """Connectivity of two vertices from a cached CC result (the reference's
    DSU fast path, graph_distrib_update.cpp:211-226)."""
    rows = cc_result.where(F.col("v").isin([a, b])).select("comp").distinct().count()
    return rows == 1


def batched_reachability(cc_result: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, connected): semi-join style batched point queries against a
    cached CC result ('Batched Reachability',
    /root/reference/plotting/R_scripts/dsu_query_plot.R:20)."""
    ca = cc_result.select(F.col("v").alias("a"), F.col("comp").alias("comp_a"))
    cb = cc_result.select(F.col("v").alias("b"), F.col("comp").alias("comp_b"))
    return (
        pairs.join(ca, on="a", how="left")
        .join(cb, on="b", how="left")
        .select(
            "a",
            "b",
            (
                F.coalesce("comp_a", F.col("a")) == F.coalesce("comp_b", F.col("b"))
            ).alias("connected"),
        )
    )
