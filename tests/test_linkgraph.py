"""Edge-derivation parity: the Spark graph law must equal the DuckDB CTE
bit-for-bit (this parity is what makes every downstream graph oracle valid)."""

from __future__ import annotations

import duckdb

from landscape_spark import linkgraph


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_directed_edges_match_duckdb(spark, sf_small):
    e = linkgraph.directed_edges(spark, sf_small)
    spark_rows = sorted((r.src, r.dst) for r in e.collect())
    con = _duck(sf_small)
    duck_rows = sorted(
        con.execute(
            f"WITH {linkgraph.EDGES_CTE} SELECT src, dst FROM lg_edges"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0


def test_undirected_edges_match_duckdb(spark, sf_small):
    e = linkgraph.undirected_edges(spark, sf_small)
    spark_rows = sorted((r.a, r.b) for r in e.collect())
    con = _duck(sf_small)
    duck_rows = sorted(
        con.execute(
            f"WITH {linkgraph.EDGES_CTE} SELECT a, b FROM lg_undirected"
        ).fetchall()
    )
    assert spark_rows == duck_rows
    for a, b in spark_rows:
        assert a < b


def test_hub_skew_present(spark, sf_small):
    """~19% of raw links land on hub vertices 0..7 (web power-law analog)."""
    e = linkgraph.directed_edges(spark, sf_small)
    hubs = e.where("dst < 8").count()
    total = e.count()
    assert hubs / total > 0.05  # hubs absorb a visible share even post-DISTINCT


def test_synth_stream_deterministic(spark):
    a = linkgraph.synth_edge_stream(spark, 1024, 10_000, seed=7).collect()
    b = linkgraph.synth_edge_stream(spark, 1024, 10_000, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r.src < 1024 and 0 <= r.dst < 1024 for r in a)


# ---------------------------------------------------------------------------
# R-MAT generator
# ---------------------------------------------------------------------------

def test_rmat_deterministic_and_bounded(spark):
    from landscape_spark.linkgraph import rmat_stream

    a = sorted(map(tuple, rmat_stream(spark, 8, 2000, seed=5).collect()))
    b = sorted(map(tuple, rmat_stream(spark, 8, 2000, seed=5).collect()))
    assert a == b and len(a) == 2000
    for _, s, d in a:
        assert 0 <= s < 256 and 0 <= d < 256
    c = sorted(map(tuple, rmat_stream(spark, 8, 2000, seed=6).collect()))
    assert a != c  # seed matters


def test_rmat_quadrant_marginals(spark):
    """P(src top bit = 1) = c + d and P(dst top bit = 1) = b + d under the
    level-independent quadrant law — checked at the top level with a
    generous statistical band (the law is deterministic, so this is a
    fixed number, not a flaky sample)."""
    from pyspark.sql import functions as F

    from landscape_spark.linkgraph import rmat_stream

    a_, b_, c_ = 0.57, 0.19, 0.19
    d_ = 1 - a_ - b_ - c_
    df = rmat_stream(spark, 10, 30000, a=a_, b=b_, c=c_)
    half = 1 << 9
    fr = df.agg(
        F.avg((F.col("src") >= half).cast("double")).alias("fs"),
        F.avg((F.col("dst") >= half).cast("double")).alias("fd"),
    ).first()
    assert abs(fr.fs - (c_ + d_)) < 0.02
    assert abs(fr.fd - (b_ + d_)) < 0.02


def test_rmat_is_skewed_and_shuffle_free(spark):
    from pyspark.sql import functions as F

    from landscape_spark.linkgraph import rmat_stream

    df = rmat_stream(spark, 12, 40000)
    deg = df.groupBy("src").count().agg(
        F.max("count").alias("mx"), F.avg("count").alias("mean")
    ).first()
    assert deg.mx > 20 * deg.mean  # hub skew, the property R-MAT exists for
    plan = rmat_stream(spark, 12, 1000)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
