"""Relational + event-stream queries over the star schema — demonstrates
the DataFrame layer's join/window/aggregation shapes with the same
oracle-parity discipline as the rest of the pipeline.

Determinism notes: money is floored to integer cents *per row* before
summing (integer sums are order-free; double sums are not), and time
buckets are integer epoch-hours (identical in Spark-UTC and DuckDB).
Scale notes: dimension joins broadcast the small side; the fact table
shuffles only on the aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup: events per (hour, type) with value cents.
    (The batch twin of a readStream → window(ts) aggregation; the events
    table is bounded here so the batch plan is the verifiable form.)"""
    e = _t(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("bucket_hour")
    cents = F.floor(F.col("value") * 100).cast("long")
    return (
        e.select(bucket, "event_type", cents.alias("cents"))
        .groupBy("bucket_hour", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("value_cents"))
    )


Q_EVENTS_HOURLY_SQL = (
    "SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket_hour, event_type, "
    "count(*) AS n_events, "
    "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
    "FROM events GROUP BY 1, 2"
)


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by event count (count-rank pattern; ties by user_id).

    Plan shape: orderBy().limit() compiles to TakeOrderedAndProject — a
    per-partition top-10 merged on the driver — instead of a global
    no-partition window, which would drag every user-count row through a
    single task at 10^9 users.  The row_number window then ranks only the
    10 surviving rows.
    """
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    top = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "user_id", "n_events", F.col("rank").cast("int").alias("rank")
    )


Q_EVENTS_TOP_USERS_SQL = (
    "SELECT user_id, n_events, CAST(rank AS INTEGER) AS rank FROM ("
    "SELECT user_id, count(*) AS n_events, "
    "row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank "
    "FROM events GROUP BY user_id) WHERE rank <= 10"
)


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation revenue rollup — fact table
    streams once, every dimension broadcast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_items"), F.sum("rev_cents").alias("rev_cents"))
    )


Q_REVENUE_BY_NATION_SQL = (
    "SELECT n_name, count(*) AS n_items, "
    "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"
    " AS rev_cents "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name"
)


QUERIES = {
    "events_hourly_rollup": q_events_hourly,
    "events_top_users": q_events_top_users,
    "rel_revenue_by_nation": q_revenue_by_nation,
}

ORACLES = {
    "events_hourly_rollup": Q_EVENTS_HOURLY_SQL,
    "events_top_users": Q_EVENTS_TOP_USERS_SQL,
    "rel_revenue_by_nation": Q_REVENUE_BY_NATION_SQL,
}
