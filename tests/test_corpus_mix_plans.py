"""Plan-shape guarantees for the corpus-prep operators: chunking and
classifier scoring must stay single-scan, zero-shuffle (they are
per-row transformations — any Exchange would be a regression that
turns a map-only 100 TB pass into a cluster-wide shuffle)."""

from __future__ import annotations

from bigdatafinalproject_spark.plans import formatted_plan
from bigdatafinalproject_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_chunking_is_shuffle_free(spark):
    plan = formatted_plan(QUERIES["doc_chunk_overlap"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # posexplode runs as a generator, not a join


def test_quality_classifier_is_shuffle_free_single_scan(spark):
    plan = formatted_plan(QUERIES["doc_quality_classifier"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    # tree section only: the formatted detail block repeats each node
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, plan


def test_temperature_mix_broadcasts_rates(spark):
    """The rate table join must be broadcast (source cardinality is
    tiny); a sort-merge join here would shuffle the full corpus."""
    plan = formatted_plan(QUERIES["doc_temperature_mix"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
