"""k-NN label-majority classification over the embeddings table.

Two physical plans behind one logical operator:

* exact broadcast-matrix path (N <= broadcast_threshold): the embedding
  matrix is broadcast as a dense numpy array and each partition scores its
  query rows against it with one BLAS matmul — a single mapInArrow scan, NO
  CartesianProduct in the plan, no shuffle. Exact, so it matches the
  all-pairs DuckDB oracle (deterministic ranking: rounded sim desc, nid asc).
* LSH-candidate path (N above threshold — the 100TB plan): hyperplane-LSH
  bucket collisions from landscape_spark.sim.ann generate candidates, exact
  cosine rescores candidates only, per-query top-k majority. Approximate by
  design; recall vs the exact path is measured in tests/test_ann.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landscape_spark.sim.ann import _dot, _emb_matrix, hyperplane_signatures_multi

BROADCAST_THRESHOLD = 200_000  # ~50MB of float32 at dim 64


def knn_label_majority(
    emb: DataFrame, k: int = 5, broadcast_threshold: int = BROADCAST_THRESHOLD
) -> DataFrame:
    """(vec_id, pred_label): majority label among the k nearest neighbors
    (cosine, self excluded); ties at the k-th rank broken by neighbor id,
    label ties by smallest label."""
    n = emb.count()
    if n <= broadcast_threshold:
        return knn_exact_broadcast(emb, k)
    return knn_lsh(emb, k)


def _majority(labels: np.ndarray) -> int:
    """Most frequent label, ties to the smallest label."""
    vals, cnts = np.unique(labels, return_counts=True)  # vals sorted asc
    return int(vals[np.argmax(cnts)])  # argmax returns FIRST max -> min label


def knn_exact_broadcast(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact kNN via broadcast dense matrix + per-partition BLAS scoring.
    The reference table is fetched as ONE Arrow table (toArrow) and decoded
    through the flat list-values buffer — no per-row Python float conversion
    on either the broadcast side or inside the scoring kernel."""
    spark = emb.sparkSession
    tbl = emb.select("vec_id", "embedding", "label").toArrow()
    ids_raw = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids_raw, kind="stable")
    ids = ids_raw[order]
    labels = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)[order]
    mat = _emb_matrix(tbl.column("embedding"))[order]
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b = spark.sparkContext.broadcast((ids, labels, mat_n))

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bids, blabels, bmat = b.value
        for qb in batches:
            if qb.num_rows == 0:
                continue
            qids = qb.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            q = _emb_matrix(qb.column("embedding"))
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(qn @ bmat.T, 6)  # ranking on ROUNDED sims (oracle parity)
            preds = np.empty(len(qids), dtype=np.int64)
            for i in range(len(qids)):
                row = sims[i]
                self_mask = bids == qids[i]
                # order by (sim desc, nid asc); bids sorted asc so stable
                # mergesort on -sim realizes exactly that tie-break
                row = np.where(self_mask, -np.inf, row)
                top = np.argsort(-row, kind="stable")[:k]
                # a corpus with N <= k rows would otherwise pull the
                # -inf-masked SELF entry into its own top-k (the SQL oracle
                # excludes self via a.vec_id <> b.vec_id)
                top = top[np.isfinite(row[top])]
                if len(top) == 0:  # single-row corpus: no neighbors at all
                    preds[i] = int(blabels[self_mask][0]) if self_mask.any() else -1
                else:
                    preds[i] = _majority(blabels[top])
            yield pa.RecordBatch.from_arrays(
                [pa.array(qids, type=pa.int64()), pa.array(preds, type=pa.int64())],
                names=["vec_id", "pred_label"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        score, "vec_id long, pred_label long"
    )


def knn_lsh(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN: candidates = same-LSH-bucket pairs from n_tables
    independent hyperplane tables — all tables' signatures from ONE corpus
    scan (hyperplane_signatures_multi) and one self-join on the compound
    (table, bucket) key, like the near-dup/lsh_topk candidate generators;
    exact cosine rescoring of candidates only; per-query top-k window
    (partitioned by qid — no global window). Vectors with zero candidates
    keep their own label (degenerate fallback)."""
    sigs = hyperplane_signatures_multi(emb, n_planes, n_tables, dim, seed)
    a = sigs.select(F.col("vec_id").alias("qid"), "table", "bucket")
    bb = sigs.select(F.col("vec_id").alias("nid"), "table", "bucket")
    cands = (
        a.join(bb, on=["table", "bucket"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    qe = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    ne = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"), "label"
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("nv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))),
        6,
    )
    scored = (
        cands.join(qe, on="qid").join(ne, on="nid").select("qid", "nid", "label", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    top = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    counts = top.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("cnt"))
    w2 = Window.partitionBy("qid").orderBy(F.desc("cnt"), F.asc("label"))
    best = (
        counts.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == 1)
        .select(F.col("qid").alias("vec_id"), F.col("label").alias("pred_label"))
    )
    # zero-candidate vectors fall back to their own label
    return (
        emb.select("vec_id", "label")
        .join(best, on="vec_id", how="left")
        .select(
            "vec_id", F.coalesce("pred_label", F.col("label")).alias("pred_label")
        )
    )


def knn_label_majority_sql(k: int = 5) -> str:
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS label,
         ROUND(
           list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
           6) AS sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
),
top AS (
  SELECT qid, nid, label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
    FROM pairs
  ) WHERE rn <= {k}
),
counts AS (
  SELECT qid, label, COUNT(*) AS cnt FROM top GROUP BY qid, label
)
SELECT qid AS vec_id, label AS pred_label FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cnt DESC, label ASC) AS rn
  FROM counts
) WHERE rn = 1
"""
