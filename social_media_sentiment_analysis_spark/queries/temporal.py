"""Temporal registry queries: as-of join and sessionization over the
events/orders tables, each with a DuckDB oracle (ASOF JOIN is native in
DuckDB; sessionization oracles as gaps-and-islands SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import as_of_join, session_rollup
from ..sources.batch import load_table

SESSION_GAP = "30 minutes"


def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the customer's most recent order at or before the
    event time (point-in-time enrichment — the feature-store/as-of pattern).
    The right side is pre-aggregated to one row per (custkey, orderdate) so
    equal-timestamp ties are deterministic in both engines."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("last_order_key"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
        )
    )
    orders = orders.withColumnRenamed("o_custkey", "user_id")
    return (
        as_of_join(events, orders, on="user_id",
                   left_ts="ts", right_ts="o_orderdate")
        .select("event_id", "user_id", "ts",
                "last_order_key", "last_order_price")
    )  # no orderBy: per-row output, driver hash is order-insensitive


ORACLE_ASOF_LATEST_ORDER = """
WITH orders_d AS (
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS last_order_key,
           arg_max(o_totalprice, o_orderkey) AS last_order_price
    FROM orders
    GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, o.last_order_key, o.last_order_price
FROM events e ASOF LEFT JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity sessions with a 30-minute inactivity gap: native
    session_window aggregation (start, end=last+gap, event count, value
    sum)."""
    events = load_table(spark, sf_dir, "events")
    return (
        session_rollup(
            events, key="user_id", ts="ts", gap=SESSION_GAP,
            aggs=[
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            ],
        )
        .select("user_id", "session_start", "session_end",
                "n_events", "total_value")
        .orderBy("user_id", "session_start")
    )


ORACLE_SESSIONIZATION = """
WITH flagged AS (
    SELECT user_id, ts, value,
           -- Spark merges touching windows: an event exactly gap after the
           -- previous one continues the session, so new-session is strict >
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT *, SUM(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS total_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""
