"""Time-series resampling: bucket to a fixed grain, densify the time
spine, and forward-fill gaps.

Net-new surface (no reference equivalent — the reference has no
event-time processing at all, SURVEY §2.10); this is the batch
regularization step a feature/training pipeline needs before windowed
models: irregular event streams -> one row per (key, bucket) with gaps
made explicit and carried values filled.

Scale notes:
- the per-key bounds frame is one row per key -> tiny; the spine
  explode produces (range-hours) rows per key, so a key spanning years
  at minute grain should be chunked (or the grain coarsened) first;
- the spine<->aggregate join is a shuffle on (key, bucket) — the same
  partitioning the aggregation just produced, so AQE reuses it;
- the forward-fill window partitions by key only (one task per key);
  with few very long keys, split the fill into (key, day) ranges and
  carry the last value across ranges with a second, tiny window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    agg_value: Column,
    unit: str = "hour",
) -> DataFrame:
    """Aggregate ``agg_value`` per (keys, date_trunc(unit, ts)), densify
    each key's bucket range via ``sequence`` + ``explode``, and
    forward-fill the aggregated value across empty buckets.

    Returns (*key_cols, bucket, was_gap:int, n_events:long,
    v_fill:double). The first bucket per key is never a gap (bounds come
    from observed data), so ``v_fill`` is never NULL.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    per_bucket = df.groupBy(*key_cols, bucket).agg(
        agg_value.alias("_v"), F.count(F.lit(1)).alias("n_events")
    )
    spine = (
        per_bucket.groupBy(*key_cols)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("_b0", "_b1", F.expr(f"INTERVAL 1 {unit}"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(per_bucket, [*key_cols, "bucket"], "left")
    fill = (
        W.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.col("_v").isNull().cast("int").alias("was_gap"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("_v", ignorenulls=True).over(fill).alias("v_fill"),
    )
