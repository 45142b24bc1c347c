"""Physical-plan assertions: the scale properties SURVEY §4 demands,
checked on the actual Catalyst output (not assumed).
"""

from __future__ import annotations

from bigdatafinalproject_spark import registry
from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.ids import dense_ids
from bigdatafinalproject_spark.plans import formatted_plan
from tests.conftest import SF_DIR


def test_clean_project_pushdown_and_pruning(spark):
    """Predicates reach the parquet scan; only 3 of 11 columns read."""
    plan = formatted_plan(registry.QUERIES["clean_project"](spark, SF_DIR))
    assert "PushedFilters:" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("\n")[0]
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema, "column pruning failed"


def test_flagship_broadcast_and_topk(spark):
    """Dim join broadcasts; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    plan = formatted_plan(registry.QUERIES["popular_parts"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_star_join_broadcasts_dims(spark):
    plan = formatted_plan(registry.QUERIES["star_join_revenue_by_nation"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, "nation/region should broadcast"


def test_semi_anti_join_strategies(spark):
    for q in ("customers_with_orders_semi", "customers_without_orders_anti"):
        plan = formatted_plan(registry.QUERIES[q](spark, SF_DIR))
        assert "LeftSemi" in plan or "LeftAnti" in plan, q


def test_dense_ids_no_global_window(spark):
    """The id assignment must never collapse the key rows into a global
    single-partition window (the reference's anti-pattern). After the
    determinism fix the ranged keys are a frozen localCheckpoint
    (ExistingRDD) and the only window runs over the per-partition
    offset counts — the key rows themselves see no window at all."""
    c = load_table(spark, SF_DIR, "customer")
    plan = formatted_plan(dense_ids(c, "c_name", num_partitions=8))
    assert "ExistingRDD" in plan, "ranged keys must be a frozen checkpoint"
    assert "monotonically_increasing_id" in plan
    # the offsets window partitions/orders by _pid (#partitions rows);
    # no window over the data rows exists
    assert "_pid" in plan


def test_aggregates_partial_final(spark):
    """Hash aggregates must have a partial (map-side) phase."""
    plan = formatted_plan(registry.QUERIES["pricing_summary"](spark, SF_DIR))
    assert "partial" in plan.lower()
