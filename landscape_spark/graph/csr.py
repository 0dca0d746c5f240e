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

CSR_SCHEMA = "part int, vids binary, indptr binary, indices binary"


def build_csr_blocks(edges: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Directed (src, dst) -> per-partition CSR: partition by pmod(src, P),
    then pack each partition's adjacency into three flat int64 arrays shipped
    as single binary cells (np.tobytes on the way out, zero-copy
    np.frombuffer on the way in). array<long> cells were measured ~10x
    slower end-to-end: every list cell materializes millions of boxed Python
    ints when the RDD path reads the row."""
    # repartition on the RAW src column: repartitioning on pmod(src, P)
    # hash-partitions the pmod VALUE, leaving ~37% of partitions empty with
    # ~3x row skew (recorded pitfall) — any consistent src-colocating
    # assignment works, since each block carries its explicit vids list
    part = edges.repartition(num_partitions, F.col("src"))

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
                pa.array([vids.astype(np.int64).tobytes()], type=pa.binary()),
                pa.array([indptr.tobytes()], type=pa.binary()),
                pa.array([dst.astype(np.int64).tobytes()], type=pa.binary()),
            ],
            names=["part", "vids", "indptr", "indices"],
        )

    return part.mapInArrow(pack, CSR_SCHEMA)


def build_csr_index(
    spark: SparkSession,
    edges: DataFrame,
    n_vertices: int,
    num_partitions: int = 32,
    dense_threshold: int = 100_000_000,
):
    """Build the reusable dense-regime CSR index: (broadcast handle, blocks,
    out_deg). Pass to pagerank_csr(..., index=...) so repeated runs on a
    static graph (and iteration-time benchmarks) pay the shuffle + pack +
    broadcast ONCE — the reference likewise INITs workers with static graph
    state once (src/worker_cluster.cpp:39-47). Call .destroy() on the
    returned broadcast when done."""
    n = n_vertices
    if n > dense_threshold:
        raise ValueError(
            "the CSR index is the dense-vector-regime path; above "
            "dense_threshold use landscape_spark.graph.pagerank"
        )
    sc = spark.sparkContext
    # guard the edge count via an agg over the <= P packed rows (cached so
    # the guard and the collect share one shuffle+pack execution — a plain
    # edges.count() would re-run the caller's whole edge plan, typically a
    # scan + distinct shuffle, a second time)
    csr = build_csr_blocks(edges, num_partitions).persist()
    m = (csr.agg(F.sum(F.octet_length("indices"))).first()[0] or 0) // 8
    if m > dense_threshold:
        csr.unpersist()
        raise ValueError(
            f"{m} edges > dense_threshold={dense_threshold}; use "
            "landscape_spark.graph.pagerank, the fully-distributed join path"
        )
    rows = csr.collect()
    csr.unpersist()
    blocks = [
        (
            np.frombuffer(r.vids, dtype=np.int64),
            np.frombuffer(r.indptr, dtype=np.int64),
            np.frombuffer(r.indices, dtype=np.int64),
        )
        for r in rows
    ]
    out_deg = np.zeros(n, dtype=np.int64)
    for vids, indptr, _ in blocks:
        out_deg[vids] = np.diff(indptr)
    return sc.broadcast(blocks), blocks, out_deg


def pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    n_vertices: int,
    iters: int = 20,
    damping: float = 0.85,
    num_partitions: int = 32,
    tree_depth: int = 2,
    dense_threshold: int = 100_000_000,
    index=None,
) -> DataFrame:
    """PageRank over CSR blocks: mapPartitions SpMV + treeAggregate partial
    sums. Returns (v, pr_score) for ALL n vertices.

    Iteration layout: the packed CSR blocks are shipped ONCE as a torrent
    broadcast (each executor/worker fetches and caches its copy on first
    touch — the reference likewise INITs workers with static graph state
    once, /root/reference/src/worker_cluster.cpp:39-47). A per-iteration task
    then moves only the fresh rank broadcast in and one partial vector out —
    a cached python-RDD partition would instead re-stream its pickled bytes
    JVM->Python on EVERY task (measured ~1 s/iter of pure transfer at 4M
    edges, 10x the SpMV itself). Partials merge through treeReduce above 64
    partitions (the bounded-fan-in cluster merge tree); below that a plain
    collect+sum is strictly less scheduling.

    This is the dense-vector regime (rank vector and per-executor CSR copy
    fit in memory: n up to ~1e8, m bounded by the broadcast budget); the
    join-based landscape_spark.graph.pagerank is the arbitrary-scale path —
    both are tested equal.

    Pass ``index=build_csr_index(...)`` to reuse the one-time shuffle +
    pack + broadcast across repeated runs on a static graph (and to time
    pure iteration cost); without it the index is built and destroyed
    internally.
    """
    n = n_vertices
    sc = spark.sparkContext
    owns_index = index is None
    if owns_index:
        index = build_csr_index(
            spark, edges, n, num_partitions, dense_threshold
        )
    csr_b, blocks, out_deg = index
    dangling_mask = out_deg == 0
    # GROUP blocks into tasks: one task per block means one python-worker
    # roundtrip per block per iteration — at 32 blocks on 2 cores that
    # fixed cost dominated the SpMV itself. Slices target ~2 waves over the
    # available parallelism (local[N] parsed directly; defaultParallelism
    # on a cluster), each task folds its blocks' partials in-process and
    # ships ONE vector out.
    master = sc.master or ""
    if master.startswith("local[") and master[6:-1].isdigit():
        par = int(master[6:-1])
    else:
        par = sc.defaultParallelism
    n_slices = max(1, min(len(blocks), 2 * par))
    ids = sc.parallelize(range(len(blocks)), n_slices)
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        rb = sc.broadcast(ranks)

        def spmv_fold(pids, _rb=rb, _csr=csr_b, _n=n):
            r = _rb.value
            acc = None
            for pid in pids:
                vids, indptr, indices = _csr.value[pid]
                deg = np.diff(indptr)
                w = np.repeat(r[vids] / deg, deg)  # per-source share
                c = np.bincount(indices, weights=w, minlength=_n)
                acc = c if acc is None else acc + c
            return iter(()) if acc is None else iter([acc])

        partials = ids.mapPartitions(spmv_fold)
        if n_slices > 64:
            contrib = partials.treeReduce(lambda a, b: a + b, depth=tree_depth)
        else:
            parts = partials.collect()
            contrib = np.sum(parts, axis=0) if parts else np.zeros(n)
        dangling = ranks[dangling_mask].sum()
        ranks = (1.0 - damping) / n + damping * (contrib + dangling / n)
        rb.destroy()
    if owns_index:
        csr_b.destroy()  # caller-provided indexes outlive the call
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
