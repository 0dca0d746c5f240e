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
