"""Embedding-cosine near-duplicate pairs — the vector-space member of the
dedup family (exact / n-gram Jaccard / MinHash-LSH / SimHash / THIS).

Two physical plans behind one logical operator (the knn.py pattern):

* exact broadcast-matrix path (N <= broadcast_threshold): the normalized
  embedding matrix is broadcast and each partition scores its block against
  it with one BLAS matmul, emitting pairs (id_lo < id_hi) with rounded
  cosine >= threshold — a single mapInArrow scan, NO CartesianProduct,
  no shuffle. Exact, so it matches the all-pairs DuckDB oracle.
* hyperplane-LSH candidate path (N above threshold — the 100TB plan):
  same-bucket pairs from independent LSH tables, exact JVM cosine rescoring
  of candidates only. Approximate by design; recall vs the exact path is
  measured in tests/test_ann.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.sim.ann import _dot, _emb_matrix, hyperplane_signatures_multi

BROADCAST_THRESHOLD = 200_000  # ~100MB of float64 at dim 64


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
) -> DataFrame:
    """(id_lo, id_hi, sim): all vector pairs with ROUND(cosine, 6) >=
    threshold, id_lo < id_hi. Exact under broadcast_threshold rows; above
    it, hyperplane-LSH candidates + exact rescore for high-cosine
    thresholds, IVF cell blocking for low-cosine ones (where hyperplane
    collision barely separates threshold pairs from random — see
    tune_hyperplane_geometry)."""
    n = emb.count()
    if n <= broadcast_threshold:
        return embedding_near_dup_exact(emb, threshold)
    k, L, recall = tune_hyperplane_geometry(threshold)
    f_random = 1.0 - (1.0 - 0.5**k) ** L
    if recall < 0.9 or f_random > 0.25:
        return embedding_near_dup_ivf(emb, threshold)
    return embedding_near_dup_lsh(emb, threshold, n_planes=k, n_tables=L)


def embedding_near_dup_exact(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Exact all-pairs via broadcast matrix + per-partition block BLAS.
    Each unordered pair is emitted exactly once: the partition holding the
    SMALLER id emits it (mask bids > qid)."""
    spark = emb.sparkSession
    tbl = emb.select("vec_id", "embedding").toArrow()
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _emb_matrix(tbl.column("embedding"))
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b = spark.sparkContext.broadcast((ids, mat_n))
    thr = float(threshold)

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bids, bmat = b.value
        for qb in batches:
            if qb.num_rows == 0:
                continue
            qids = qb.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            q = _emb_matrix(qb.column("embedding"))
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(qn @ bmat.T, 6)  # threshold on ROUNDED (oracle parity)
            mask = (sims >= thr) & (bids[None, :] > qids[:, None])
            ri, ci = np.nonzero(mask)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[ri], type=pa.int64()),
                    pa.array(bids[ci], type=pa.int64()),
                    pa.array(sims[ri, ci], type=pa.float64()),
                ],
                names=["id_lo", "id_hi", "sim"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        score, "id_lo long, id_hi long, sim double"
    )


def tune_hyperplane_geometry(
    threshold: float,
    target_recall: float = 0.9,
    max_tables: int = 64,
) -> tuple[int, int, float]:
    """(n_planes, n_tables, recall_at_threshold) minimizing random-pair
    candidate admission subject to recall >= target_recall AT the threshold.

    Hyperplane-LSH per-plane collision for cosine t is p = 1 - arccos(t)/pi;
    a k-plane table collides w.p. p^k and L tables give recall
    1-(1-p^k)^L, while a RANDOM pair (cosine ~0, p=1/2) is admitted w.p.
    1-(1-2^-k)^L. Low thresholds sit in hyperplane LSH's unselective regime
    (t=0.35 -> p=0.614: even the best feasible geometry admits ~half of all
    pairs) — callers get a RuntimeWarning from embedding_near_dup_lsh when
    that happens and should use the exact path or raise the threshold."""
    import math

    p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    best = None
    for k in range(16, 1, -1):
        pk = p**k
        if pk <= 0 or pk >= 1:
            continue
        need = math.log(max(1.0 - target_recall, 1e-12)) / math.log(1.0 - pk)
        L = int(math.ceil(need))
        if L < 1 or L > max_tables:
            continue
        f_random = 1.0 - (1.0 - 0.5**k) ** L
        recall = 1.0 - (1.0 - pk) ** L
        if best is None or f_random < best[3]:
            best = (k, L, recall, f_random)
    if best is None:  # even 2 planes can't reach the target within the cap
        return 2, max_tables, 1.0 - (1.0 - p**2) ** max_tables
    return best[0], best[1], best[2]


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Scale path: same-bucket candidate pairs from n_tables hyperplane-LSH
    tables, exact JVM cosine rescore of candidates only. Candidate volume is
    ~N^2/2^planes per table instead of N^2.

    Geometry is threshold-aware by default (tune_hyperplane_geometry,
    recall >= 0.9 at the threshold boundary; higher-cosine pairs recall
    better). The pre-round-3 fixed default (8 planes x 8 tables) had ~15%
    recall for pairs AT threshold 0.35 — passing explicit n_planes/n_tables
    still pins the geometry, but the auto-tuned path warns when the
    threshold is in hyperplane LSH's unselective regime (low cosine: the
    plane test barely separates threshold pairs from random ones) instead
    of silently dropping near-threshold pairs."""
    import warnings

    if (n_planes is None) != (n_tables is None):
        # mixing one pinned value with one tuned-for-a-different-k value
        # gives a geometry nobody chose (and the warning's recall figure
        # would describe the tuned pair, not the one that runs)
        raise ValueError("pass both n_planes and n_tables, or neither")
    if n_planes is None:
        k, L, recall = tune_hyperplane_geometry(threshold)
        n_planes = k
        n_tables = L
        import math

        p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
        f_random = 1.0 - (1.0 - 0.5**n_planes) ** n_tables
        if recall < 0.9 or f_random > 0.25:
            warnings.warn(
                f"threshold {threshold} is in hyperplane LSH's unselective "
                f"regime (per-plane collision {p:.2f}): best geometry "
                f"{n_planes} planes x {n_tables} tables gives recall "
                f"{recall:.2f} at the threshold while admitting "
                f"{f_random:.0%} of random pairs — use embedding_near_dup_ivf "
                "(IVF cell blocking) or the exact path for low-cosine mining",
                RuntimeWarning,
                stacklevel=2,
            )
    # ONE scan emits (vec_id, table, bucket) for all L tables; candidates
    # are one self-join on the compound key — not L scans + L joins + union
    sigs = hyperplane_signatures_multi(emb, n_planes, n_tables, dim, seed)
    a = sigs.select(F.col("vec_id").alias("id_lo"), "table", "bucket")
    bb = sigs.select(F.col("vec_id").alias("id_hi"), "table", "bucket")
    cands = (
        a.join(bb, on=["table", "bucket"])
        .where(F.col("id_lo") < F.col("id_hi"))
        .select("id_lo", "id_hi")
        .distinct()
    )
    return _rescore_pairs(emb, cands, threshold)


def _rescore_pairs(emb: DataFrame, cands: DataFrame, threshold: float) -> DataFrame:
    """Exact JVM cosine of candidate (id_lo, id_hi) pairs, thresholded on the
    ROUNDED value (oracle parity with the exact path)."""
    lo = emb.select(F.col("vec_id").alias("id_lo"), F.col("embedding").alias("ev_lo"))
    hi = emb.select(F.col("vec_id").alias("id_hi"), F.col("embedding").alias("ev_hi"))
    sim = F.round(
        _dot(F.col("ev_lo"), F.col("ev_hi"))
        / (
            F.sqrt(_dot(F.col("ev_lo"), F.col("ev_lo")))
            * F.sqrt(_dot(F.col("ev_hi"), F.col("ev_hi")))
        ),
        6,
    )
    return (
        cands.join(lo, on="id_lo")
        .join(hi, on="id_hi")
        .select("id_lo", "id_hi", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def ivf_multi_assign(
    emb: DataFrame, cents, nprobe: int = 4
) -> DataFrame:
    """(vec_id, cell): each vector assigned to its ``nprobe`` NEAREST cells
    (multi-probe blocking — single-cell assignment splits a near-dup pair
    whenever it straddles a Voronoi boundary; probing the nprobe nearest
    cells makes boundary pairs share at least one block w.h.p.)."""
    import pyarrow as pa

    from landscape_spark.sim.ann import _emb_matrix

    sc = emb.sparkSession.sparkContext
    b = sc.broadcast(np.asarray(cents, dtype=np.float64))
    npb = int(nprobe)

    def assign(batches):
        c = b.value
        k = min(npb, c.shape[0])
        for bt in batches:
            if bt.num_rows == 0:
                continue
            ids = bt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _emb_matrix(bt.column("embedding"))
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ c.T
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k].astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, k), type=pa.int64()),
                    pa.array(top.reshape(-1), type=pa.int64()),
                ],
                names=["vec_id", "cell"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        assign, "vec_id long, cell long"
    )


def embedding_near_dup_ivf(
    emb: DataFrame,
    threshold: float = 0.35,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF-blocked near-dup pairs — the scale path for LOW-cosine thresholds
    where hyperplane LSH is unselective (embedding_near_dup_lsh warns and
    points here; hyperplane collision at cosine 0.35 barely separates
    threshold pairs from random ones, while coarse k-means cells block by
    REGION of the sphere).

    Plan: deterministic distributed Lloyd k-means (ann.ivf_train_centroids),
    each vector multi-assigned to its nprobe nearest cells, candidates =
    pairs sharing any cell (one self-join on cell — never a cross join),
    exact JVM cosine rescore of candidates only. Candidate mass is
    ~ sum_cells |cell|^2 ~ N^2 * nprobe^2 / n_cells for balanced cells: size
    n_cells to the corpus (n_cells ~ N / target_cell_size keeps cells
    rescoreable) — with n_cells growing with N the per-cell join stays
    bounded, which is the standard IVF scaling story. Recall vs the exact
    path is measured in tests on planted moderate-cosine pairs."""
    from landscape_spark.sim.ann import ivf_train_centroids

    cents = ivf_train_centroids(emb, n_cells=n_cells, iters=iters, dim=dim, seed=seed)
    assigned = ivf_multi_assign(emb, cents, nprobe=nprobe)
    a = assigned.select(F.col("vec_id").alias("id_lo"), "cell")
    bb = assigned.select(F.col("vec_id").alias("id_hi"), "cell")
    cands = (
        a.join(bb, on="cell")
        .where(F.col("id_lo") < F.col("id_hi"))
        .select("id_lo", "id_hi")
        .distinct()
    )
    return _rescore_pairs(emb, cands, threshold)


def embedding_near_dup_sql(threshold: float = 0.35) -> str:
    return f"""
SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
       ROUND(
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
         6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
         6) >= {threshold}
"""
