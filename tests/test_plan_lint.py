"""Plan lint: systematic scale-safety assertions over EVERY registered
query's physical plan (SURVEY §4.3 — the single-task global window is
the reference's core anti-pattern, and a silent scale-killer anywhere).

Two rules, enforced by tree traversal (not string matching):

1. No Window/WindowGroupLimit node may read SinglePartition input,
   unless the query is in the allowlist below with a boundedness
   justification (the input cardinality is bounded by construction, so
   the single task touches O(k) rows regardless of data size).
2. No CartesianProduct node at all (a cross join must either broadcast
   — BroadcastNestedLoopJoin over a dimension-sized side — or not
   exist).

ALS and streaming queries are excluded: their returned frames are
model/memory-sink scans, not the interesting dataflow (their plans are
audited by their own tests).
"""

from __future__ import annotations

import pytest

from bigdatafinalproject_spark import registry
from tests.conftest import SF_DIR

# query -> why a SinglePartition-fed window is bounded there
_BOUNDED_WINDOW_OK = {
    # pool rank runs over the TakeOrderedAndProject result: exactly
    # pool_k (10) rows by construction, independent of data size
    "recs_wide_assembly": "rank over orderBy().limit(k) pool, k rows",
    # operators/ids.py dense-ID offsets: the window input is the
    # per-partition count aggregate — exactly numPartitions rows (a
    # config constant), never data-sized
    "dense_customer_ids": "offset window over numPartitions count rows",
    "surrogate_join_back": "offset window over numPartitions count rows",
    # operators/cumsum.py running-sum offsets: same shape — one row per
    # repartitionByRange partition
    "part_abc_analysis": "offset window over numPartitions partial rows",
    "doc_weighted_sample": "offset window over numPartitions partial rows",
    # queries/recommend.py: AUC/ROC windows run over the quantized
    # score grid — ≤ _ROC_BINS (256) rows BY CONSTRUCTION after the
    # groupBy(bin), independent of input cardinality
    "eval_auc": "window over fixed 256-bin quantized score grid",
    "eval_roc_points": "window over fixed 256-bin quantized score grid",
    # exact Mann-Whitney AUC (r10): the prefix sum is the distributed
    # running_sum — its only SinglePartition window is the offset
    # window over the numPartitions per-partition partials
    "eval_auc_exact": "offset window over numPartitions partial rows",
    # revenue share-of-total: windows partition over the nation
    # dimension (25 rows, data-model-bounded)
    "nation_revenue_share": "windows over nation dimension (25 rows)",
}


def _lint(df):
    """Walk the FINAL physical plan (AQE-resolved) of df.

    ``queryExecution().executedPlan()`` returns AdaptiveSparkPlanExec
    whose ``inputPlan`` is the plan BEFORE EnsureRequirements — no
    exchanges exist yet and every node reports UnknownPartitioning, so
    walking it sees no SinglePartition feeds (the r3 blind spot: the
    bench logged live ``WindowExec: No Partition Defined`` warnings
    while this lint stayed green). ``finalPhysicalPlan()`` materializes
    the query stages and returns the plan that actually ran, where the
    Exchange/SinglePartition structure is real. Query stages are
    descended via ``.plan()`` so upstream stages are linted too.
    """
    single_part_windows, cartesians = [], []

    def walk(node):
        name = node.nodeName()
        n = node.children().size()
        for i in range(n):
            walk(node.children().apply(i))
        if name in ("Window", "WindowGroupLimit") and n >= 1:
            part = node.children().apply(0).outputPartitioning().toString()
            if part == "SinglePartition":
                single_part_windows.append(name)
        if name == "CartesianProduct":
            cartesians.append(name)
        if name == "AdaptiveSparkPlan":
            walk(node.finalPhysicalPlan())
        elif name.endswith("QueryStage"):
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return single_part_windows, cartesians


def _params():
    return [
        n
        for n in sorted(registry.QUERIES)
        if not n.startswith(("als_", "stream_"))
    ]


@pytest.mark.parametrize("name", _params())
def test_no_unbounded_single_partition_window_or_cartesian(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    sp_windows, cartesians = _lint(df)
    if sp_windows and name not in _BOUNDED_WINDOW_OK:
        pytest.fail(
            f"{name}: {sp_windows} reads SinglePartition input — a "
            "single task processes every row at scale. Repartition, "
            "use a top-k aggregate, or add an allowlist entry with a "
            "boundedness justification."
        )
    assert not cartesians, f"{name}: CartesianProduct in plan"
    # Rule 3 — driver-contract schema guard: the correctness
    # canonicalizer sorts pandas rows, and array/map/struct output
    # columns crash it ("unhashable type: numpy.ndarray" — the r4
    # embedding_pca_project red row). Every registered query must
    # return only atomic columns; unpack arrays into per-element
    # columns or format to a string before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} would crash the "
        "driver's result canonicalizer"
    )
