"""Per-partition CSR blocks + SpMV PageRank with treeAggregate merges.

North-star requirement: "sketch updates and SpMV-style message passing
execute as mapPartitions over CSR with treeAggregate merges (bounded-shuffle
sketch combination mirroring Landscape's cluster merge tree)". The CSR block
is the engine's analog of the reference's per-vertex batches
(/root/reference/include/worker_cluster.h:8): all of a source vertex's
out-edges live in one partition, packed as indptr/indices arrays.

pagerank_csr: per iteration each partition computes its local contribution
vector with pure numpy (indptr diff + bincount over indices), partials are
summed through treeAggregate (depth 2 — a bounded-shuffle merge tree, never
all-to-driver in one hop), the driver applies damping/dangling and broadcasts
the next rank vector. This is the dense-vector regime (rank vector fits in
memory: n up to ~10^8 per 1 GB). Beyond that the block-partitioned variant
(vector sharded like the matrix) applies; the join-based
landscape_spark.graph.pagerank is that fully-distributed path — both
implementations are tested equal.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CSR_SCHEMA = "part int, vids array<long>, indptr array<long>, indices array<long>"


def build_csr_blocks(edges: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Directed (src, dst) -> per-partition CSR: partition by pmod(src, P),
    then pack each partition's adjacency into three flat arrays. One row per
    partition; columnar, Arrow-friendly, zero per-row Python."""
    part = edges.repartition(num_partitions, F.pmod(F.col("src"), F.lit(num_partitions)))

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        srcs, dsts = [], []
        for b in batches:
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
        if not srcs:
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        vids, counts = np.unique(src, return_counts=True)
        indptr = np.zeros(len(vids) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int32()),
                pa.array([vids.tolist()], type=pa.list_(pa.int64())),
                pa.array([indptr.tolist()], type=pa.list_(pa.int64())),
                pa.array([dst.tolist()], type=pa.list_(pa.int64())),
            ],
            names=["part", "vids", "indptr", "indices"],
        )

    return part.mapInArrow(pack, CSR_SCHEMA)


def pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    n_vertices: int,
    iters: int = 20,
    damping: float = 0.85,
    num_partitions: int = 32,
    tree_depth: int = 2,
) -> DataFrame:
    """PageRank over CSR blocks: mapPartitions SpMV + treeAggregate partial
    sums. Returns (v, pr_score) for ALL n vertices."""
    n = n_vertices
    csr = build_csr_blocks(edges, num_partitions)
    # carry CSR blocks as an RDD of numpy triples, cached once
    blocks = (
        csr.rdd.map(
            lambda r: (
                np.array(r.vids, dtype=np.int64),
                np.array(r.indptr, dtype=np.int64),
                np.array(r.indices, dtype=np.int64),
            )
        )
        .cache()
    )
    blocks.count()
    out_deg = np.zeros(n, dtype=np.int64)
    for vids, indptr, _ in blocks.map(lambda t: (t[0], t[1], None)).collect():
        out_deg[vids] = np.diff(indptr)
    dangling_mask = out_deg == 0
    sc = spark.sparkContext
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        rb = sc.broadcast(ranks)
        invdeg = out_deg  # closure-safe copy below

        def spmv(block, _rb=rb):
            vids, indptr, indices = block
            r = _rb.value
            share = r[vids] / np.diff(indptr)  # per-source share
            w = np.repeat(share, np.diff(indptr))
            contrib = np.bincount(indices, weights=w, minlength=len(r))
            return contrib

        partials = blocks.map(spmv)
        contrib = partials.treeReduce(lambda a, b: a + b, depth=tree_depth)
        dangling = ranks[dangling_mask].sum()
        ranks = (1.0 - damping) / n + damping * (contrib + dangling / n)
        rb.destroy()
    blocks.unpersist()
    # emit DISTRIBUTED: broadcast the final dense vector and index it from a
    # spark.range scan — no n-row Python list on the driver
    final_b = sc.broadcast(ranks)

    def emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        r = final_b.value
        for b in batches:
            ids = b.column("id").to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(r[ids], type=pa.float64())],
                names=["v", "pr_score"],
            )

    return (
        spark.range(n)
        .repartition(num_partitions)
        .mapInArrow(emit, "v long, pr_score double")
    )
