"""k-NN label-majority classification over the embeddings table.

All-pairs cosine (exact) with deterministic ranking — the correctness
baseline for embedding-space classification; the LSH tables in
landscape_spark.sim.ann are the 100TB candidate-generation path. Fully
SQL-expressible, so it ships with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landscape_spark.sim.ann import _dot


def knn_label_majority(emb: DataFrame, k: int = 5) -> DataFrame:
    """(vec_id, pred_label): majority label among the k nearest neighbors
    (cosine, self excluded); ties at the k-th rank broken by neighbor id,
    label ties by smallest label."""
    a = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    b = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"), "label"
    )
    dot = _dot(F.col("qv"), F.col("nv"))
    sim = F.round(
        dot / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))),
        6,
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", "label", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    top = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    counts = top.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("cnt"))
    w2 = Window.partitionBy("qid").orderBy(F.desc("cnt"), F.asc("label"))
    return (
        counts.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == 1)
        .select(F.col("qid").alias("vec_id"), F.col("label").alias("pred_label"))
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
