"""Structured Streaming queries (SURVEY §7.7 — net-new surface).

Each runs a real streaming query (file source standing in for Kafka)
to completion against a memory sink. Complete-mode aggregations have
exact DuckDB oracles (finite input ⇒ streaming result == batch
result); append/update-mode results depend on watermark advancement
and are rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.registry import query
from bigdatafinalproject_spark.streaming import events as S


@query(
    "stream_tumbling",
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
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregation, complete mode
    — must equal the batch result exactly (same oracle as
    events_tumbling)."""
    return S.tumbling_counts(spark, sf_dir)


@query(
    "stream_dedup_count",
    oracle="SELECT COUNT(DISTINCT event_id) AS n_unique FROM events",
)
def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dropDuplicates — row count must equal the
    batch distinct count."""
    return S.dedup_stream(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_unique"))


@query("stream_sessions")
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) streaming sessionization,
    append mode. Rows-only: append emits only watermark-closed sessions
    (trailing sessions stay in state by design)."""
    return S.session_counts(spark, sf_dir)


@query("stream_user_totals")
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals. Rows-only: update-mode emission cadence is
    batch-dependent."""
    return S.running_user_totals(spark, sf_dir)


@query(
    "stream_foreachbatch_sink",
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
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch parquet sink with idempotent overwrite (the
    exactly-once pattern for non-transactional sinks); returns the sink
    contents, which must equal the batch tumbling aggregation."""
    return S.tumbling_to_parquet_foreachbatch(spark, sf_dir)
