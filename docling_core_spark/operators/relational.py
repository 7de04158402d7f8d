"""Relational demonstration queries over the TPC-H-ish testdata tables.

docling-core has no relational operators (SURVEY.md §2.7) — these exist to
exercise and verify the engine's Catalyst-native path (scan -> filter ->
join -> aggregate) against the DuckDB oracle, including the join strategies
we rely on elsewhere (broadcast for small dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (partial-aggregate friendly)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_summary_sql() -> str:
    """Oracle for pricing_summary."""
    return """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(AVG(l_quantity), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer across orders->lineitem with broadcast dims."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .join(F.broadcast(cust.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
    return rev


def top_customers_sql() -> str:
    """Oracle for top_customers."""
    return """
SELECT c.c_custkey, c.c_name, round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed event aggregation (tumbling 1-hour buckets per event type)."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts")).alias("hour_bucket")
    return (
        ev.groupBy(bucket, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_bucket", "event_type")
    )


def events_sessionized_sql() -> str:
    """Oracle for events_sessionized."""
    return """
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
"""
