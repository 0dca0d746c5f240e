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

from landscape_spark.sim.ann import _dot, _emb_matrix, hyperplane_signatures

BROADCAST_THRESHOLD = 200_000  # ~100MB of float64 at dim 64


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
) -> DataFrame:
    """(id_lo, id_hi, sim): all vector pairs with ROUND(cosine, 6) >=
    threshold, id_lo < id_hi. Exact under broadcast_threshold rows; LSH
    candidates + exact rescore above it."""
    n = emb.count()
    if n <= broadcast_threshold:
        return embedding_near_dup_exact(emb, threshold)
    return embedding_near_dup_lsh(emb, threshold)


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


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Scale path: same-bucket candidate pairs from n_tables hyperplane-LSH
    tables, exact JVM cosine rescore of candidates only. Candidate volume is
    ~N^2/2^planes per table instead of N^2; recall vs exact is measured in
    tests (hyperplane LSH collision prob = 1 - theta/pi per plane, so
    low-cosine thresholds need more tables — tune n_tables to the target
    threshold's recall)."""
    cands = None
    for t in range(n_tables):
        sigs = hyperplane_signatures(emb, n_planes, dim, seed + t * 1000)
        a = sigs.select(F.col("vec_id").alias("id_lo"), "bucket")
        bb = sigs.select(F.col("vec_id").alias("id_hi"), "bucket")
        c = (
            a.join(bb, on="bucket")
            .where(F.col("id_lo") < F.col("id_hi"))
            .select("id_lo", "id_hi")
        )
        cands = c if cands is None else cands.unionAll(c)
    cands = cands.distinct()
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
