"""Stream-stream interval join (SURVEY §7.7 — net-new): purchases
matched to the same user's clicks within a preceding window, with
watermarks bounding both sides' state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.streaming.events import _run_to_memory, read_event_stream


def click_purchase_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 60
) -> DataFrame:
    """Inner stream-stream join: (click, purchase) pairs for the same
    user where the purchase lands in (click_ts, click_ts + within].

    Both sides carry watermarks so the join state is bounded: clicks
    can be evicted once the purchase-side watermark passes
    click_ts + within.
    """
    ev = read_event_stream(spark, sf_dir)
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
    joined = clicks.join(
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
    return _run_to_memory(joined, "append", "bdfp_mem_cpjoin")
