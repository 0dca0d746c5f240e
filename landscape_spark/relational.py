"""Relational query surface over the star-schema tables.

The reference engine has no relational operators (SURVEY.md §2.6) — these
demonstrate the engine's composition surface (windows, sessionization,
joins, date functions, top-k) as PySpark plans with exact DuckDB oracles.
Every query is a single declarative plan: Catalyst handles pushdown, join
selection, and partial aggregation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user by total value per event_type (groupBy + window rank)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "user_id", "total_value")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user: (user_id, session_id, n_events,
    session_start, session_end). Window lag + running count of session starts."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem join orders, monthly revenue (join + date_trunc + agg)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by revenue (join + agg + deterministic top-k)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # top-k heaps + a k-row driver merge, never a single-partition window.
    return (
        per.orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
        .select("p_partkey", "revenue")
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, month) revenue subtotals + grand total. NULL grouping
    slots are coalesced to -1 so value hashing is engine-neutral."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return (
        j.rollup("y", "m")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("y", F.lit(-1)).cast("int").alias("y"),
            F.coalesce("m", F.lit(-1)).cast("int").alias("m"),
            "revenue",
            "n",
        )
    )


def q_events_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over value-conditioned cohorts: (heavy purchasers
    INTERSECT frequent errorers) EXCEPT high-value viewers. The driver's
    synthetic events give every user every event type, so the cohorts are
    aggregate-conditioned to make the set algebra non-trivial (19 rows at
    sf0.01)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def cohort(etype: str, having):
        g = ev.where(F.col("event_type") == etype).groupBy("user_id")
        return having(g).select("user_id")

    buyers = cohort("purchase", lambda g: g.agg(F.sum("value").alias("s")).where(F.col("s") > 50))
    errorers = cohort("error", lambda g: g.agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 12))
    viewers = cohort("view", lambda g: g.agg(F.max("value").alias("m")).where(F.col("m") > 98))
    return buyers.intersect(errorers).exceptAll(viewers.distinct()).select("user_id")


def q_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions + aggregation: per market segment, customer count,
    rounded average balance, count of negative balances, max of the
    upper-cased 8-char name prefix."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_negative"),
        F.max(F.upper(F.substring("c_name", 1, 8))).alias("max_prefix"),
    )


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_top_users": q_events_top_users,
    "events_sessionize": q_events_sessionize,
    "revenue_by_month": q_revenue_by_month,
    "top_parts": q_top_parts,
    "revenue_rollup": q_revenue_rollup,
    "events_type_overlap": q_events_type_overlap,
    "customer_segments": q_customer_segments,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "events_top_users": """
WITH per AS (
  SELECT event_type, user_id, ROUND(SUM(value), 6) AS total_value
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, total_value FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY total_value DESC, user_id ASC) AS rn
  FROM per
) WHERE rn = 1
""",
    "events_sessionize": f"""
WITH marked AS (
  SELECT user_id, event_id, ts,
         -- FLOOR(epoch(...)) matches Spark's unix_timestamp WHOLE-SECOND
         -- truncation; DuckDB's epoch() alone returns fractional DOUBLE
         -- seconds and would split sessions differently for gaps within
         -- 1s of the boundary on sub-second timestamps
         CASE WHEN FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER w IS NULL
                OR FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER w > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
""",
    "revenue_by_month": """
SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY date_trunc('month', o.o_orderdate)
""",
    "top_parts": """
WITH per AS (
  SELECT p.p_partkey AS p_partkey,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey
)
SELECT p_partkey, revenue FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, p_partkey ASC) AS rn
  FROM per
) WHERE rn <= 10
""",
    "revenue_rollup": """
WITH j AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS y,
         EXTRACT(month FROM o.o_orderdate) AS m,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(COALESCE(y, -1) AS INT) AS y,
       CAST(COALESCE(m, -1) AS INT) AS m,
       ROUND(SUM(rev), 4) AS revenue,
       COUNT(*) AS n
FROM j GROUP BY ROLLUP (y, m)
""",
    "events_type_overlap": """
SELECT user_id FROM events WHERE event_type = 'purchase'
  GROUP BY user_id HAVING SUM(value) > 50
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
  GROUP BY user_id HAVING COUNT(*) >= 12
EXCEPT
SELECT user_id FROM events WHERE event_type = 'view'
  GROUP BY user_id HAVING MAX(value) > 98
""",
    "customer_segments": """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 4) AS avg_bal,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       MAX(UPPER(SUBSTRING(c_name, 1, 8))) AS max_prefix
FROM customer GROUP BY c_mktsegment
""",
}
