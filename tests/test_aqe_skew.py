"""AQE runtime skew-join handling — the automatic complement to the
engine's manual salting operators (skew_salted_join / skew_salted_agg):
at 100 TB a hot key turns one sort-merge partition into a straggler
that runs for hours; AQE's OptimizeSkewedJoin splits that partition
into sub-partitions at runtime using the actual shuffle sizes. This
pins that the session configuration actually triggers it."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    # 9:1 skew onto one key; thresholds lowered so the ~MB-scale test
    # shuffle is "skewed" by AQE's definition (defaults target 256 MB)
    conf_keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        # incompressible payload: a constant-key partition of plain longs
        # RLE/LZ4-compresses below any threshold and AQE sees no skew
        left = spark.range(500_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # plain join, NO aggregation on k above it: a parent requiring
        # hashpartitioning(k) would (correctly) veto the skew split
        joined = left.join(right, "k").select("k", "w", "payload")
        # collect() executes THIS DataFrame's own QueryExecution, so the
        # AdaptiveSparkPlan below is the finalized one (count() would
        # execute a derived Dataset and leave this plan un-adapted)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed side:\n{plan[:2000]}"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
