"""Bucketed-table co-located joins + MLlib grid-search CV parity."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.plans import formatted_plan
from tests.conftest import SF_DIR


def test_bucketed_join_avoids_shuffle(spark):
    """Bucketing both sides of a join key writes co-located data so the
    join plans WITHOUT a shuffle exchange on either side — the 100 TB
    repeated-join strategy (guide: `bucketBy` section)."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    with tempfile.TemporaryDirectory() as d:
        spark.sql("CREATE DATABASE IF NOT EXISTS bdb LOCATION '" + d + "/bdb'")
        (
            o.write.format("parquet")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bdb.orders_b")
        )
        (
            li.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.format("parquet")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bdb.lineitem_b")
        )
        try:
            # the test tables are broadcast-sized; turn broadcast off so
            # the plan exercises the bucketed sort-merge path a 100 TB
            # fact-fact join would take
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            ob = spark.table("bdb.orders_b")
            lb = spark.table("bdb.lineitem_b")
            joined = ob.join(lb, on="o_orderkey").select("o_orderkey", "o_custkey", "l_partkey")
            plan = formatted_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
            # and it is still correct
            expected = (
                o.join(li, o.o_orderkey == li.l_orderkey).count()
            )
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
            spark.sql("DROP TABLE IF EXISTS bdb.lineitem_b")
            spark.sql("DROP DATABASE IF EXISTS bdb")


def test_grid_search_cv(spark):
    """MLlib CrossValidator parity (M7): small grid, returns a fitted
    winner whose params come from the grid."""
    from bigdatafinalproject_spark.pipelines.recommender import grid_search

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem")
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").cast("int").alias("userId"),
            F.col("l_partkey").cast("int").alias("itemId"),
            F.col("l_quantity").cast("float").alias("rating"),
        )
    )
    best, rank, reg, metrics = grid_search(
        ratings, ranks=[2, 4], reg_params=[0.1], num_folds=2, max_iter=2
    )
    assert rank in (2, 4)
    assert reg == 0.1
    assert len(metrics) == 2 and all(m > 0 for m in metrics)
