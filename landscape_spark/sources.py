"""Edge-table storage: partitioned parquet writer/reader.

SURVEY.md §7 Phase 1: an Iceberg runtime jar is not bundled with local
PySpark, so the default is Spark-catalog parquet with the identical layout —
hash-bucketed by source vertex so (a) a cluster can co-locate joins on src
and (b) point lookups prune partitions. On a real deployment the writer is
swapped for an Iceberg table with the same `bucket` spec (set ICEBERG=1 and
provide the runtime jar).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 32


def write_edge_table(
    edges: DataFrame, path: str, num_buckets: int = N_BUCKETS_DEFAULT
) -> None:
    """Write (src, dst, ...) partitioned by pmod(src, num_buckets). Directory
    layout bucket=K/ gives partition pruning for src-point lookups and a
    stable co-location key for repeated graph jobs (the persisted analog of
    the reference's per-vertex gutter grouping)."""
    (
        edges.withColumn("bucket", F.pmod(F.col("src"), F.lit(num_buckets)))
        .repartition(num_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_edge_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def read_edges_of_src(
    spark: SparkSession, path: str, src: int, num_buckets: int = N_BUCKETS_DEFAULT
) -> DataFrame:
    """Point lookup that prunes to one bucket directory (check
    .explain('formatted') for PartitionFilters) then filters exactly."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col("bucket") == src % num_buckets) & (F.col("src") == src)
    ).drop("bucket")


def edge_table_files(path: str) -> dict[str, int]:
    """bucket dir -> file count (layout introspection for tests/lineage)."""
    out = {}
    for d in sorted(os.listdir(path)):
        if d.startswith("bucket="):
            out[d] = len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
    return out
