"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (CC component sizes on the derived link graph).
queries()     — registry of implemented operators (landscape_spark engine).
oracle_sql()  — matching DuckDB SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from landscape_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SKETCH-based connected components (the engine's headline
    machinery — l0-sampling supernodes + Boruvka merge rounds) of the link
    graph derived from /root/testdata/sf0.001 documents, reported as
    component sizes."""
    from pyspark.sql import functions as F

    cc = entry_queries.q_cc_sketch(spark, "/root/testdata/sf0.001")
    return cc.groupBy("comp").agg(F.count(F.lit(1)).alias("comp_size"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from landscape_spark import relational

    regs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    regs.update(entry_queries.GRAPH_QUERIES)
    regs.update(entry_queries.TEXT_QUERIES)
    regs.update(relational.RELATIONAL_QUERIES)
    regs.update(entry_queries.EXTRA_QUERIES)
    return regs


def oracle_sql() -> dict[str, str]:
    from landscape_spark import relational

    out: dict[str, str] = {}
    out.update(entry_queries.GRAPH_ORACLES)
    out.update(entry_queries.TEXT_ORACLES)
    out.update(relational.RELATIONAL_ORACLES)
    out.update(entry_queries.EXTRA_ORACLES)
    # the sketch CC path is exact w.h.p. — hold it to the same SQL oracle
    out["cc_sketch"] = entry_queries.GRAPH_ORACLES["cc"]
    return out
