"""Similarity search over the ``embeddings`` table (array<float> column).

* brute_force_topk — exact cosine top-k against a query vector, expressed as
  a single JVM-side column expression (F.aggregate/zip_with — no Python).
  This is the correctness baseline and has a DuckDB oracle
  (list_cosine_similarity).
* lsh_topk — random-hyperplane LSH bucketing as the 100TB path: signatures
  via one vectorized numpy pass, candidates = query-bucket collisions only,
  exact rescoring of candidates. Recall vs brute force measured in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64


def _emb_matrix(col) -> np.ndarray:
    """(N, dim) float64 matrix from an Arrow list<float> column via the flat
    values buffer (``flatten()`` is vectorized C++ honoring slice offsets) —
    no per-row ``to_pylist``/``list(map(float, ...))`` conversion anywhere.
    Embeddings are fixed-dim and non-null, so the reshape is exact."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64, copy=False)


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(vec_col: str, query: list[float]) -> F.Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.col(vec_col)
    dot = _dot(v, q)
    nv = F.sqrt(_dot(v, v))
    nq = float(np.sqrt(np.dot(query, query)))
    return dot / (nv * F.lit(nq))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine: (vec_id, sim). Deterministic ranking: rounded
    sim desc, vec_id asc (ranking on the ROUNDED value so float-ulp noise
    can't reorder ties across engines). Scale: the scan is embarrassingly
    parallel; top-k is a TakeOrdered (no full sort shuffle)."""
    sim = F.round(cosine_col("embedding", query), 6).alias("sim")
    scored = emb.select("vec_id", sim)
    # orderBy().limit(k) = TakeOrderedAndProject: per-partition k-heaps
    # merged on the driver — no single-partition WindowExec.
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k).select(
        "vec_id", "sim"
    )


def brute_force_topk_sql(query: list[float], k: int = 10) -> str:
    qlit = "[" + ", ".join(f"{float(x)!r}" for x in query) + "]"
    return f"""
WITH scored AS (
  SELECT vec_id,
         ROUND(
           list_dot_product(CAST(embedding AS DOUBLE[]), {qlit})
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product({qlit}, {qlit}))), 6) AS sim
  FROM embeddings
)
SELECT vec_id, sim FROM (
  SELECT vec_id, sim, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def hyperplane_signatures(
    emb: DataFrame, n_planes: int = 16, dim: int = 64, seed: int = 42
) -> DataFrame:
    """(vec_id, bucket int): sign pattern against seeded random hyperplanes.
    The planes are derived deterministically from the seed on every executor
    (same trick as the reference's INIT seed broadcast)."""
    planes = _planes(n_planes, dim, seed)

    def sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            mat = _emb_matrix(b.column("embedding"))
            proj = mat @ planes.T  # (N, P)
            bits = (proj > 0).astype(np.int64)
            bucket = (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(bucket, type=pa.int64())],
                names=["vec_id", "bucket"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(sig, "vec_id long, bucket long")


def hyperplane_signatures_multi(
    emb: DataFrame, n_planes: int, n_tables: int, dim: int = 64, seed: int = 42
) -> DataFrame:
    """(vec_id, table, bucket): signatures for ALL n_tables LSH tables in a
    SINGLE scan of the embeddings table — one (N, L*k) matmul per batch
    instead of L separate corpus scans (the round-3 candidate generators
    re-scanned and re-projected the table once per LSH table; with
    auto-tuned geometry L reaches 64, i.e. 64 scans + 64 joins).

    Table t's bucket is bit-identical to
    hyperplane_signatures(emb, n_planes, dim, seed + t*1000) — the same
    seeded plane derivation, so prebuilt single-table signatures remain
    interchangeable with one slice of this output."""
    planes_all = np.concatenate(
        [_planes(n_planes, dim, seed + t * 1000) for t in range(n_tables)], axis=0
    )  # (L*k, dim)
    weights = 1 << np.arange(n_planes)

    def sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            mat = _emb_matrix(b.column("embedding"))
            proj = mat @ planes_all.T  # (N, L*k)
            bits = (proj > 0).astype(np.int64).reshape(len(ids), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # (N, L)
            tbl = np.broadcast_to(
                np.arange(n_tables, dtype=np.int64), (len(ids), n_tables)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_tables), type=pa.int64()),
                    pa.array(tbl.reshape(-1), type=pa.int64()),
                    pa.array(buckets.reshape(-1), type=pa.int64()),
                ],
                names=["vec_id", "table", "bucket"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        sig, "vec_id long, table long, bucket long"
    )


def _planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    raw = splitmix64(
        np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9)
    )
    # map uint64 -> approx standard normal via sum of 4 uniforms (CLT, exact
    # determinism matters more than tail quality for LSH)
    u = np.stack(
        [((raw >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.float64) / 65535.0 for s in (0, 16, 32, 48)]
    ).sum(axis=0) - 2.0
    return u.reshape(n_planes, dim)


def ivf_train_centroids(
    emb: DataFrame, n_cells: int = 16, iters: int = 5, dim: int = 64, seed: int = 42
) -> np.ndarray:
    """Deterministic distributed Lloyd k-means on the unit sphere (the IVF
    coarse quantizer). Init = seeded pseudo-random unit vectors; per
    iteration one mapInArrow pass emits ONE packed partial-state row per
    partition (per-cell vector sums + counts as a binary blob); the driver
    reduces C x dim doubles — tiny and scale-independent. Everything is
    seeded, so every executor and every run agrees."""
    cents = _planes(n_cells, dim, seed + 77)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    for _ in range(iters):
        b = sc.broadcast(cents)

        def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            c = b.value
            sums = np.zeros_like(c)
            cnts = np.zeros(c.shape[0], dtype=np.float64)
            seen = False
            for bt in batches:
                if bt.num_rows == 0:
                    continue
                seen = True
                mat = _emb_matrix(bt.column("embedding"))
                mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
                cell = np.argmax(mat @ c.T, axis=1)
                np.add.at(sums, cell, mat)
                cnts += np.bincount(cell, minlength=c.shape[0])
            if seen:
                blob = np.concatenate([sums.reshape(-1), cnts]).tobytes()
                yield pa.RecordBatch.from_arrays(
                    [pa.array([blob], type=pa.binary())], names=["state"]
                )

        states = emb.select("embedding").mapInArrow(partial, "state binary").collect()
        sums = np.zeros_like(cents)
        cnts = np.zeros(n_cells, dtype=np.float64)
        for row in states:
            arr = np.frombuffer(row.state, dtype=np.float64)
            sums += arr[: n_cells * dim].reshape(n_cells, dim)
            cnts += arr[n_cells * dim :]
        nz = cnts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / cnts[nz, None]
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        b.destroy()
    return cents


def ivf_assign(emb: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment — one broadcast scan."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(cents)

    def assign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        c = b.value
        for bt in batches:
            if bt.num_rows == 0:
                continue
            ids = bt.column("vec_id").to_numpy(zero_copy_only=False)
            mat = _emb_matrix(bt.column("embedding"))
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cell = np.argmax(mat @ c.T, axis=1).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(cell, type=pa.int64())],
                names=["vec_id", "cell"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(assign, "vec_id long, cell long")


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    dim: int = 64,
    seed: int = 42,
    cents: np.ndarray | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k (the second 100TB ANN path beside lsh_topk):
    scan only the nprobe cells whose centroids are closest to the query —
    the scanned fraction is ~nprobe/n_cells of the corpus. Pass cents /
    assigned to reuse a trained index across queries (the realistic usage);
    otherwise they are built here."""
    if cents is None:
        cents = ivf_train_centroids(emb, n_cells=n_cells, iters=iters, dim=dim, seed=seed)
    if assigned is None:
        assigned = ivf_assign(emb, cents)
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(cents @ qn), kind="stable")[:nprobe].tolist()
    cand = assigned.where(F.col("cell").isin([int(x) for x in probe])).select("vec_id")
    sim = F.round(cosine_col("embedding", query), 6).alias("sim")
    scored = emb.join(cand, on="vec_id", how="left_semi").select("vec_id", sim)
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k).select(
        "vec_id", "sim"
    )


def lsh_signature_tables(
    emb: DataFrame,
    n_planes: int = 10,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> list[DataFrame]:
    """Prebuild + cache the per-table LSH signature DataFrames so REPEATED
    queries skip the n_tables corpus scans — the LSH analog of reusing IVF's
    trained (cents, assigned) index across queries. Derivation is seeded, so
    a prebuilt table is interchangeable with an inline one."""
    out = []
    for t in range(n_tables):
        s = hyperplane_signatures(emb, n_planes, dim, seed + t * 1000).cache()
        out.append(s)
    return out


def lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    sigs: list[DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k: union of candidates from n_tables independent LSH
    tables (query-bucket collisions), exact cosine rescoring, deterministic
    ranking. At 100TB the candidate set is ~N/2^planes per table instead of N.
    Pass ``sigs`` from lsh_signature_tables to amortize the signature scans
    across a query workload.

    The inline (sigs=None) path computes all n_tables signatures in ONE
    corpus scan (hyperplane_signatures_multi) and filters to the query's
    per-table buckets — not one scan per table."""

    def _qbucket(t: int) -> int:
        planes = _planes(n_planes, dim, seed + t * 1000)
        qproj = planes @ np.array(query, dtype=np.float64)
        return int(((qproj > 0).astype(np.int64) * (1 << np.arange(n_planes))).sum())

    if sigs is None:
        multi = hyperplane_signatures_multi(emb, n_planes, n_tables, dim, seed)
        hit = F.lit(False)
        for t in range(n_tables):
            hit = hit | ((F.col("table") == t) & (F.col("bucket") == _qbucket(t)))
        cands = multi.where(hit).select("vec_id").distinct()
    else:
        assert len(sigs) == n_tables
        cands = None
        for t in range(n_tables):
            c = sigs[t].where(F.col("bucket") == _qbucket(t)).select("vec_id")
            cands = c if cands is None else cands.unionAll(c)
        cands = cands.distinct()
    sim = F.round(cosine_col("embedding", query), 6).alias("sim")
    scored = emb.join(cands, on="vec_id", how="left_semi").select("vec_id", sim)
    return scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(k).select(
        "vec_id", "sim"
    )
