"""Dynamic partition pruning: a selective dimension filter prunes the
FACT table's partitions at RUNTIME — the star-schema scan pattern that
makes partitioned 100 TB fact tables queryable (only the partitions
the filtered dimension actually references are read).

Static pruning handles literal predicates on the partition column;
DPP covers the common case where the predicate arrives THROUGH A JOIN
(fact.partition_key = dim.key AND dim.attr = 'x') by planning a
subquery filter on the dimension side and reusing the broadcast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def part_orders(spark, tmp_path_factory):
    """Orders written partitioned by priority (a low-cardinality
    partition key mirroring a date-partitioned fact table)."""
    d = str(tmp_path_factory.mktemp("dpp") / "orders_part")
    load_table(spark, SF_DIR, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(d)
    return d


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, part_orders):
    """The dim attribute is pure DATA (a lookup mapping, not an
    expression over the join key), so the optimizer cannot fold it
    into a static partition predicate — runtime pruning is the only
    way to skip fact partitions, which is exactly DPP's case."""
    fact = spark.read.parquet(part_orders)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "fast"),
            ("2-HIGH", "fast"),
            ("3-MEDIUM", "slow"),
            ("4-NOT SPECIFIED", "slow"),
            ("5-LOW", "slow"),
        ],
        "dim_priority string, tier string",
    )
    j = fact.join(
        F.broadcast(dim),
        fact["o_orderpriority"] == dim["dim_priority"],
    ).filter(F.col("tier") == "fast")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected a dynamic-partition-pruning subquery on the fact scan"
    )
    # semantics: DPP must not change results — only skip dead partitions
    expect = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .count()
    )
    assert j.count() == expect


def test_static_partition_filter_prunes_without_join(spark, part_orders):
    """Baseline: a literal predicate on the partition column prunes
    statically (PartitionFilters in the scan, no subquery needed)."""
    fact = spark.read.parquet(part_orders)
    q = fact.filter(F.col("o_orderpriority") == "1-URGENT")
    explained = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explained
    assert (
        q.count()
        == load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )


@pytest.fixture(scope="module")
def week_part_lineitem(spark, tmp_path_factory):
    """Lineitem written partitioned by ship week — the date-partitioned
    fact layout the Q72 shape (brand_week_lag_chain) would use at
    100 TB."""
    d = str(tmp_path_factory.mktemp("dpp72") / "lineitem_by_week")
    (
        load_table(spark, SF_DIR, "lineitem")
        .withColumn(
            "ship_week",
            F.date_format(F.date_trunc("week", "l_shipdate"), "yyyy-MM-dd"),
        )
        .write.mode("overwrite")
        .partitionBy("ship_week")
        .parquet(d)
    )
    return d


def test_q72_shape_week_dim_prunes_fact_partitions(spark, week_part_lineitem):
    """VERDICT r7 #6: the Q72 shape's filtered week dimension must
    dynamic-partition-prune a week-partitioned fact scan — the dim's
    kept weeks are pure DATA (a created lookup frame), so only a
    runtime subquery filter can skip fact partitions."""
    fact = spark.read.parquet(week_part_lineitem)
    weeks = sorted(
        r.ship_week
        for r in fact.select("ship_week").distinct().collect()
    )
    kept = weeks[: max(1, len(weeks) // 10)]
    dim = spark.createDataFrame(
        [(w, 1996) for w in kept], "w_start string, d_year int"
    )
    j = fact.join(
        F.broadcast(dim), fact["ship_week"] == dim["w_start"]
    ).filter(F.col("d_year") == 1996)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected a dynamic-partition-pruning subquery on the "
        "week-partitioned fact scan"
    )
    expect = fact.filter(F.col("ship_week").isin(kept)).count()
    assert j.count() == expect > 0
