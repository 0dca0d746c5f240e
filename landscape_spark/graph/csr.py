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


# ---------------------------------------------------------------------------
# Block-partitioned CSR PageRank (rank vector SHARDED like the matrix):
# the n > dense_threshold regime where neither a driver-resident rank
# vector nor a vertex-sized broadcast fits.
# ---------------------------------------------------------------------------

BLOCKED_CSR_SCHEMA = (
    "i int, j int, vids binary, indptr binary, indices binary, degs binary"
)


def build_blocked_csr(
    edges: DataFrame, n_vertices: int, shards: int, num_partitions: int = 32
) -> tuple[DataFrame, DataFrame]:
    """2-D partitioned CSR: vertex space cut into ``shards`` contiguous
    ranges of width ceil(n/S); block (i, j) holds the edges src-shard-i ->
    dst-shard-j as LOCAL-index CSR plus each source's FULL-row out-degree
    (``degs``, float64 aligned to vids — static, so the per-iteration join
    needs only the rank shard). One shuffle on (i, j); each block is three
    binary cells, never boxed rows.

    Returns (blocks, deg_rows): deg_rows = (i, deg_dense) one dense
    float64 row per src shard THAT HAS OUT-EDGES (the dangling scan
    left-joins it: a missing row means the whole shard is dangling)."""
    S = int(shards)
    width = -(-int(n_vertices) // S)  # ceil
    keyed = edges.select(
        (F.col("src") / width).cast("int").alias("i"),
        (F.col("dst") / width).cast("int").alias("j"),
        "src",
        "dst",
    )
    part = keyed.repartition(min(num_partitions, S * S), "i", "j")

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        iis, jjs, srcs, dsts = [], [], [], []
        for b in batches:
            iis.append(b.column("i").to_numpy(zero_copy_only=False))
            jjs.append(b.column("j").to_numpy(zero_copy_only=False))
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
        if not iis:
            return
        ii = np.concatenate(iis).astype(np.int64)
        jj = np.concatenate(jjs).astype(np.int64)
        src = np.concatenate(srcs).astype(np.int64)
        dst = np.concatenate(dsts).astype(np.int64)
        # one partition may hold several (i, j) groups: sort by the
        # composite key, then slice group runs
        order = np.lexsort((src, jj, ii))
        ii, jj, src, dst = ii[order], jj[order], src[order], dst[order]
        key = ii * S + jj
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        out_i, out_j, out_v, out_p, out_x = [], [], [], [], []
        for s, e in zip(starts, ends):
            bs, bd = src[s:e], dst[s:e]
            base_i, base_j = int(ii[s]) * width, int(jj[s]) * width
            vids, counts = np.unique(bs - base_i, return_counts=True)
            indptr = np.zeros(len(vids) + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            out_i.append(int(ii[s]))
            out_j.append(int(jj[s]))
            out_v.append(vids.tobytes())
            out_p.append(indptr.tobytes())
            out_x.append((bd - base_j).astype(np.int64).tobytes())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_i, type=pa.int32()),
                pa.array(out_j, type=pa.int32()),
                pa.array(out_v, type=pa.binary()),
                pa.array(out_p, type=pa.binary()),
                pa.array(out_x, type=pa.binary()),
            ],
            names=["i", "j", "vids", "indptr", "indices"],
        )

    # materialize the packed blocks ONCE (<= S*S compact rows): both the
    # degree derivation and the gather join below read them, and an un-cut
    # plan would re-run the m-row repartition + pack kernel per reference
    blocks = part.mapInArrow(
        pack, "i int, j int, vids binary, indptr binary, indices binary"
    ).localCheckpoint(eager=True)

    # full-row out-degrees are derived FROM THE PACKED BLOCKS (per-block
    # counts = diff(indptr) scatter-added across the j row) instead of a
    # second groupBy over the raw m-row edge table — the deg side's shuffle
    # is then <= S*S block summaries, not m edges (guide §2.3: shuffle
    # metadata, not payload; the values are identical integers).
    def packdeg(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[int, np.ndarray] = {}
        for b in batches:
            cols = {name: b.column(name) for name in b.schema.names}
            for row in range(b.num_rows):
                shard = int(cols["i"][row].as_py())
                vids = np.frombuffer(cols["vids"][row].as_py(), dtype=np.int64)
                indptr = np.frombuffer(cols["indptr"][row].as_py(), dtype=np.int64)
                dense = acc.get(shard)
                if dense is None:
                    dense = acc[shard] = np.zeros(width, dtype=np.float64)
                dense[vids] += np.diff(indptr)
        for shard, dense in acc.items():
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([shard], type=pa.int32()),
                    pa.array([dense.tobytes()], type=pa.binary()),
                ],
                names=["i", "deg_dense"],
            )

    deg_blocks = blocks.select("i", "vids", "indptr").repartition(
        min(num_partitions, S), "i"
    ).mapInArrow(packdeg, "i int, deg_dense binary")

    def gather(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            nrow = b.num_rows
            if nrow == 0:
                continue
            cols = {name: b.column(name) for name in b.schema.names}
            degs_out = []
            for r in range(nrow):
                vids = np.frombuffer(cols["vids"][r].as_py(), dtype=np.int64)
                dense = np.frombuffer(cols["deg_dense"][r].as_py(), dtype=np.float64)
                degs_out.append(dense[vids].tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    cols["i"],
                    cols["j"],
                    cols["vids"],
                    cols["indptr"],
                    cols["indices"],
                    pa.array(degs_out, type=pa.binary()),
                ],
                names=["i", "j", "vids", "indptr", "indices", "degs"],
            )

    return (
        blocks.join(deg_blocks, on="i").mapInArrow(gather, BLOCKED_CSR_SCHEMA),
        deg_blocks,
    )


def pagerank_csr_blocked(
    spark: SparkSession,
    edges: DataFrame,
    n_vertices: int,
    iters: int = 20,
    damping: float = 0.85,
    shards: int = 32,
    num_partitions: int = 32,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """PageRank with the rank vector SHARDED like the matrix — the
    fully-distributed CSR path for n beyond the dense-vector regime (the
    broadcast-once pagerank_csr needs the whole rank vector on the driver
    and every executor: fine to n ~ 10^8, impossible at 10^9+).

    Per iteration (all DataFrame ops, nothing driver-sized):
      1. rank shards (i, r[width]) hash-join the static 2-D CSR blocks on
         the SOURCE shard i — the only vertex-scale movement is each rank
         shard streaming to its row of blocks;
      2. each block SpMVs its local numpy CSR into a PARTIAL dst-shard
         vector (j, p[width]) — ~S partials per dst shard, each width*8
         bytes, so per-iteration shuffle is ~S * n * 8 / S = n * 8 bytes
         per nonempty block row: the classic 2-D SpMV volume knob (pick
         shards so width*8 fits comfortably in a task);
      3. partials shuffle on j and fold; the dangling scalar folds in as a
         1-row broadcast crossJoin (same trick as the join path — no
         driver collect in the loop);
      4. the new shard row localCheckpoints, cutting lineage per iteration.

    Values match the join path and the dense CSR path to float-sum
    reordering (~1e-13 relative; tested). ``blocks`` accepts a pre-built
    build_blocked_csr result so static-graph reruns skip the pack.
    Semantics (damping, uniform dangling spread) are standard PageRank —
    identical to landscape_spark.graph.pagerank."""
    S = int(shards)
    n = int(n_vertices)
    width = -(-n // S)
    if blocks is None:
        blocks, deg_rows = build_blocked_csr(edges, n, S, num_partitions)
    else:
        blocks, deg_rows = blocks
    # cache the static block table PRE-PARTITIONED ON THE JOIN KEY: the
    # per-iteration rank join then reuses the cached partitioning and only
    # the S rank-shard rows shuffle — an unpartitioned cache moved (or
    # broadcast-collected) the whole packed graph on EVERY iteration.
    p_i = min(num_partitions, S)
    blocks = blocks.repartition(p_i, "i").persist()
    blocks.count()  # materialize the static side once
    deg_rows = deg_rows.persist()
    deg_rows.count()

    # rank state: one dense float64 row per shard (trailing out-of-range
    # slots of the last shard stay 0 and receive/contribute nothing)
    def init(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for shard in b.column("id").to_numpy(zero_copy_only=False):
                lo = int(shard) * width
                hi = min(lo + width, n)
                r = np.zeros(width, dtype=np.float64)
                r[: hi - lo] = 1.0 / n
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([int(shard)], type=pa.int32()),
                        pa.array([r.tobytes()], type=pa.binary()),
                    ],
                    names=["i", "r"],
                )

    ranks = (
        spark.range(S)
        .repartition(min(num_partitions, S))
        .mapInArrow(init, "i int, r binary")
        .localCheckpoint(eager=True)
    )

    def spmv(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols = {name: b.column(name) for name in b.schema.names}
            js, ps = [], []
            for row in range(b.num_rows):
                vids = np.frombuffer(cols["vids"][row].as_py(), dtype=np.int64)
                indptr = np.frombuffer(cols["indptr"][row].as_py(), dtype=np.int64)
                indices = np.frombuffer(cols["indices"][row].as_py(), dtype=np.int64)
                degs = np.frombuffer(cols["degs"][row].as_py(), dtype=np.float64)
                r = np.frombuffer(cols["r"][row].as_py(), dtype=np.float64)
                w = np.repeat(r[vids] / degs, np.diff(indptr))
                p = np.bincount(indices, weights=w, minlength=width)
                js.append(int(cols["j"][row].as_py()))
                ps.append(p.tobytes())
            if js:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(js, type=pa.int32()), pa.array(ps, type=pa.binary())],
                    names=["j", "p"],
                )

    def dang_fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # left join: a shard with NO out-edges has no deg row — every one
        # of its (in-range) rank slots is dangling mass. Padding slots of
        # the last shard carry rank 0, so summing them is harmless.
        tot = 0.0
        seen = False
        for b in batches:
            cols = {name: b.column(name) for name in b.schema.names}
            for row in range(b.num_rows):
                r = np.frombuffer(cols["r"][row].as_py(), dtype=np.float64)
                raw = cols["deg_dense"][row].as_py()
                if raw is None:
                    tot += float(r.sum())
                else:
                    deg = np.frombuffer(raw, dtype=np.float64)
                    tot += float(r[deg == 0].sum())
                seen = True
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([tot], type=pa.float64())], names=["d"]
            )

    def update(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[int, np.ndarray] = {}
        dang_box: dict[int, float] = {}
        for b in batches:
            cols = {name: b.column(name) for name in b.schema.names}
            for row in range(b.num_rows):
                j = int(cols["j"][row].as_py())
                p = np.frombuffer(cols["p"][row].as_py(), dtype=np.float64)
                dang_box[j] = float(cols["_dang"][row].as_py())
                cur = acc.get(j)
                acc[j] = p.copy() if cur is None else cur + p
        for j, c in acc.items():
            lo = j * width
            hi = min(lo + width, n)
            r = np.zeros(width, dtype=np.float64)
            r[: hi - lo] = (1.0 - damping) / n + damping * (
                c[: hi - lo] + dang_box[j] / n
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([j], type=pa.int32()),
                    pa.array([r.tobytes()], type=pa.binary()),
                ],
                names=["i", "r"],
            )

    zero = np.zeros(width, dtype=np.float64).tobytes()
    for _ in range(iters):
        dang_df = (
            ranks.join(deg_rows, on="i", how="left")
            .mapInArrow(dang_fold, "d double")
            .agg(F.coalesce(F.sum("d"), F.lit(0.0)).alias("_dang"))
        )
        # shuffle-hash hint on the RANK side: build the tiny rank-shard hash
        # table per partition and stream the cached blocks through it —
        # never broadcast-collect the block table (its size estimate sits
        # under the threshold at bench scale, but a broadcast would collect
        # the whole packed graph to the driver each iteration and is exactly
        # what the sharded path exists to avoid at n > 10^8)
        partials = blocks.join(ranks.hint("shuffle_hash"), on="i").mapInArrow(
            spmv, "j int, p binary"
        )
        # every shard must emit a row even with no inbound edges: union a
        # zero partial per shard (tiny — S rows)
        zeros = ranks.select(F.col("i").alias("j"), F.lit(zero).alias("p"))
        ranks = (
            partials.unionAll(zeros)
            .crossJoin(F.broadcast(dang_df))
            .repartition(min(num_partitions, S), "j")
            .mapInArrow(update, "i int, r binary")
            .localCheckpoint(eager=True)
        )

    blocks.unpersist()  # the repartitioned copy; ranks are checkpointed
    deg_rows.unpersist()

    def emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols = {name: b.column(name) for name in b.schema.names}
            for row in range(b.num_rows):
                i = int(cols["i"][row].as_py())
                r = np.frombuffer(cols["r"][row].as_py(), dtype=np.float64)
                lo = i * width
                hi = min(lo + width, n)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.arange(lo, hi, dtype=np.int64), type=pa.int64()),
                        pa.array(r[: hi - lo], type=pa.float64()),
                    ],
                    names=["v", "pr_score"],
                )

    out = ranks.mapInArrow(emit, "v long, pr_score double")
    return out
