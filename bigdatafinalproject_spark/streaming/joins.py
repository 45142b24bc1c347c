"""Stream-stream interval join (SURVEY §7.7 — net-new): purchases
matched to the same user's clicks within a preceding window, with
watermarks bounding both sides' state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.streaming.events import (
    _run_to_memory,
    read_event_stream,
)


def click_purchase_plan(ev: DataFrame, within_minutes: int = 60) -> DataFrame:
    """The inner interval-join PLAN, source-agnostic (see
    streaming/events.tumbling_plan): (click, purchase) pairs for the
    same user where the purchase lands in (click_ts, click_ts +
    within]. Both sides carry watermarks so streaming join state is
    bounded; on a batch frame the watermarks are no-ops and the same
    expression is a plain interval join."""
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    return clicks.join(
        purchases,
        on=F.expr(
            f"""
            c_user = p_user AND
            purchase_ts > click_ts AND
            purchase_ts <= click_ts + INTERVAL {within_minutes} MINUTES
            """
        ),
        how="inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("purchase_value").cast("double").alias("purchase_value"),
    )


def click_purchase_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 60
) -> DataFrame:
    """Inner stream-stream join: (click, purchase) pairs for the same
    user where the purchase lands in (click_ts, click_ts + within].

    Both sides carry watermarks so the join state is bounded: clicks
    can be evicted once the purchase-side watermark passes
    click_ts + within.
    """
    joined = click_purchase_plan(
        read_event_stream(spark, sf_dir), within_minutes
    )
    return _run_to_memory(joined, "append", "bdfp_mem_cpjoin")


def click_purchase_left_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 60
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, with its
    matching purchase(s) or NULLs if none arrived within the window.

    The operationally hard part of outer stream joins is NULL emission:
    an unmatched click can only be emitted once the PURCHASE-side
    watermark proves nothing can still match (past click_ts + within),
    so the query runs in drain mode and — critically — the flush events
    must survive the per-side event_type filters (isin includes
    '_flush'): filtered out before withWatermark they would never
    advance either side's watermark and the unmatched rows would sit in
    state forever. Flush rows have user_id < 0, never match a real
    user, and are removed from the MATERIALIZED sink (a filter inside
    the streaming plan would be pushed below the watermark operator).
    """
    ev = read_event_stream(spark, sf_dir, drain=True)
    clicks = (
        ev.filter(F.col("event_type").isin("click", "_flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type").isin("purchase", "_flush"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        on=F.expr(
            f"""
            c_user = p_user AND
            purchase_ts > click_ts AND
            purchase_ts <= click_ts + INTERVAL {within_minutes} MINUTES
            """
        ),
        how="leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("purchase_value").cast("double").alias("purchase_value"),
    )
    out = _run_to_memory(joined, "append", "bdfp_mem_cpjoin_left")
    return out.filter(F.col("user_id") >= 0)


def click_purchase_full_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 60
) -> DataFrame:
    """FULL OUTER stream-stream interval join — both unmatched sides
    emit NULLs: clicks with no purchase in the window AND purchases
    with no preceding click. Each side's NULL emission is gated on the
    OTHER side's watermark (same flush discipline as the left join:
    '_flush' rows must survive the event_type filters to advance both
    watermarks, and are dropped from the materialized sink). user_id
    is COALESCEd across sides since either may be NULL."""
    ev = read_event_stream(spark, sf_dir, drain=True)
    clicks = (
        ev.filter(F.col("event_type").isin("click", "_flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type").isin("purchase", "_flush"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        on=F.expr(
            f"""
            c_user = p_user AND
            purchase_ts > click_ts AND
            purchase_ts <= click_ts + INTERVAL {within_minutes} MINUTES
            """
        ),
        how="fullOuter",
    ).select(
        F.coalesce("c_user", "p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.col("purchase_value").cast("double").alias("purchase_value"),
    )
    out = _run_to_memory(joined, "append", "bdfp_mem_cpjoin_full")
    return out.filter(F.col("user_id") >= 0)
