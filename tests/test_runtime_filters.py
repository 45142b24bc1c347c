"""Runtime filtering at scale: row-level bloom-filter injection and
dynamic partition pruning — the two mechanisms that keep a selective
dim join from scanning the full fact side on a real cluster. Local
data is far below the production size thresholds, so the tests lower
the thresholds to prove the MECHANISM fires, then restore them.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from tests.conftest import SF_DIR


def _with_confs(spark, confs: dict[str, str]):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old: dict[str, str | None]) -> None:
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_for_selective_dim_join(spark):
    """With a selective filter on the dim side, Spark injects a bloom
    filter on the fact side's join key so non-matching fact rows drop
    at the scan, before the shuffle. Production defaults gate this on
    creation/application side sizes (10M/10G) — lowered here to assert
    the rewrite itself."""
    old = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            # force a shuffle join: broadcast joins don't need the filter
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_quantity")
        p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") == 1).select(
            "p_partkey"
        )
        j = li.join(p, li.l_partkey == p.p_partkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan[:2000]
    finally:
        _restore(spark, old)


def test_dynamic_partition_pruning_on_partitioned_fact(spark):
    """A fact table partitioned on the join key is pruned at runtime by
    the dim side's filter result (DPP): the fact scan carries a
    dynamicpruning subquery instead of reading every partition."""
    fact_dir = os.path.join(tempfile.gettempdir(), "bdfp_dpp_fact")
    events = load_table(spark, SF_DIR, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(fact_dir)
    old = _with_confs(
        spark,
        {
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
            # let the filtered dim broadcast (the reuse-exchange path)
            "spark.sql.autoBroadcastJoinThreshold": "10MB",
        },
    )
    try:
        fact = spark.read.parquet(fact_dir)
        # The dim filter must (a) NOT be statically inferable onto the
        # join key (a literal equality on event_type would push down
        # without DPP) and (b) be "likely selective" in Catalyst's
        # PartitionPruning sense — a literal comparison, not a join.
        # So: filter on the aggregate count, with the literal resolved
        # from data first.
        counts = (
            load_table(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        mx = counts.agg(F.max("n")).collect()[0][0]
        dim = counts.filter(F.col("n") == F.lit(mx)).select("event_type")
        # DPP's default reuseBroadcastOnly=true piggybacks the pruning
        # subquery on the dim's broadcast exchange — hint it explicitly
        # (aggregate outputs have no size stats, so no auto-broadcast)
        j = fact.join(F.broadcast(dim), "event_type").groupBy("event_type").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        assert len(j.collect()) >= 1
    finally:
        _restore(spark, old)
