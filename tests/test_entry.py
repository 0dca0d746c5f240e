"""Local replica of the driver's correctness gate: run every queries() entry
at sf=0.01 and compare against its oracle_sql() in DuckDB — row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(rows):
    out = []
    for row in rows:
        norm_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm_row.append("nan")
                else:
                    norm_row.append(round(v, 9))
            else:
                norm_row.append(v)
        out.append(tuple(norm_row))
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def oracle_results():
    con = _duck()
    out = {}
    for name, sql in entry_mod.oracle_sql().items():
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        out[name] = (cols, cur.fetchall())
    return out


def test_all_queries_have_oracles_or_are_flagged():
    q = entry_mod.queries()
    assert len(q) > 0


@pytest.mark.parametrize("name", list(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name, oracle_results):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in oracle_results:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible)
        return
    cols, duck_rows = oracle_results[name]
    # sort columns by name on both sides (driver semantics)
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(cols)), key=lambda i: cols[i])
    assert sorted(spark_cols) == sorted(cols), f"{name}: column names differ"
    s_rows = _norm([tuple(r[i] for i in s_order) for r in spark_rows])
    d_rows = _norm([tuple(r[i] for i in d_order) for r in duck_rows])
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert s_rows == d_rows, f"{name}: values differ; first spark={s_rows[:3]} duck={d_rows[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["comp", "comp_size"]
