"""Event-time analytics over the events table (batch side of the
streaming surface, SURVEY §7.7): tumbling / sliding windows and the
as-of join. The streaming executions of the same semantics live in
bigdatafinalproject_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.operators.asof import asof_join
from bigdatafinalproject_spark.registry import query


@query(
    "events_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (F.window — the exact batch
    equivalent of the streaming groupBy(window(...)))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_sliding",
    oracle="""
    WITH starts AS (
      SELECT event_id, value,
             time_bucket(INTERVAL '30 minutes', ts)
                 - CAST(o AS INT) * INTERVAL '30 minutes' AS ws,
             ts
      FROM events, LATERAL unnest(range(0, 2)) AS u(o))
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM starts
    WHERE ts < ws + INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h size, 30 min slide): each event lands in 2
    windows. The oracle enumerates the window starts explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "events_asof_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
           o_orderkey AS last_orderkey,
           CAST(o_totalprice AS DOUBLE) AS last_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order
    at-or-before the event time (union-merge plan, one shuffle — the
    oracle states the same semantics as a per-event argmax)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        e,
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("event_ts"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").cast("double").alias("last_totalprice"),
    )
