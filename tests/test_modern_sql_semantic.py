"""Targeted tests for the round-4 surface additions: SemDeDup-style
semantic dedup, LATERAL decorrelation, ordered listagg, XML roundtrip.
(Oracle value checks live in test_registry_oracle.py; these pin the
structural / plan properties the docstrings claim.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafinalproject_spark import registry
from bigdatafinalproject_spark.plans import formatted_plan
from tests.conftest import SF_DIR


def test_semantic_dedup_keeps_cluster_minimum(spark):
    """Greedy keep-lowest can never drop a cluster's lowest-id vector,
    and drops are strictly fewer than cluster size."""
    out = registry.QUERIES["doc_semantic_dedup"](spark, SF_DIR).collect()
    assert len(out) > 0
    total_dropped = 0
    for r in out:
        assert 0 <= r.n_dropped < r.n_vectors
        total_dropped += r.n_dropped
        if r.n_dropped > 0:
            # dropped ids sum over n_dropped DISTINCT positive ids —
            # each >= 1, and none can be the cluster's minimum (id 0's
            # cluster: sum >= 1+2+...)
            assert r.dropped_id_sum >= r.n_dropped * (r.n_dropped + 1) // 2 - r.n_dropped
    # tau=0.3 on the synthetic embeddings does find near-dups
    assert total_dropped > 0


def test_semantic_dedup_pairs_confined_to_clusters(spark):
    """The self-join is keyed on cid (SemDeDup's whole scale story) —
    the plan must show an equi-join, never a CartesianProduct or
    BroadcastNestedLoopJoin over the corpus."""
    df = registry.QUERIES["doc_semantic_dedup"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lateral_top_orders_decorrelates_to_group_limit(spark):
    """Catalyst must rewrite the correlated ORDER BY+LIMIT lateral
    subquery into a WindowGroupLimit (top-N per group) — not a
    per-customer nested loop."""
    df = registry.QUERIES["lateral_top_orders"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per-customer cardinality bound: at most 2 orders each
    counts = (
        df.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert counts <= 2


def test_listagg_is_deterministic_across_runs(spark):
    """WITHIN GROUP ordering makes the aggregated string independent of
    shuffle arrival order: two separate executions must agree exactly."""
    q = registry.QUERIES["nation_rich_listagg"]
    a = {r.c_nationkey: r.names for r in q(spark, SF_DIR).collect()}
    b = {r.c_nationkey: r.names for r in q(spark, SF_DIR).collect()}
    assert a == b
    for names in a.values():
        parts = names.split(",")
        assert parts == sorted(parts)


def test_xml_roundtrip_matches_parquet_source(spark):
    """XML write→read is value-lossless: the aggregate over the XML
    readback equals the same aggregate computed directly on parquet."""
    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.functions import dsum

    got = {
        r.c_mktsegment: (r.n_cust, r.total_acctbal)
        for r in registry.QUERIES["xml_roundtrip_agg"](spark, SF_DIR).collect()
    }
    want = {
        r.c_mktsegment: (r.n_cust, r.total_acctbal)
        for r in load_table(spark, SF_DIR, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .collect()
    }
    assert got == want


def test_bfs_distances_on_path_graph(spark):
    """Frontier BFS on a directed 6-node path: exact hop distances up
    to max_hops, nothing beyond, visited nodes never relabeled."""
    from bigdatafinalproject_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(2, 4)], "src long, dst long"
    )
    src = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist for r in bfs_distances(edges, src, max_hops=3).collect()
    }
    # 0-1-2-3 via path, 4 via the 2->4 shortcut at hop 3
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_weighted_systematic_sample_exact_k_and_coverage(spark):
    """Exactly k rows come back when all weights <= W/k; picks are the
    strictly increasing sequence 1..k; heavier rows are selected more
    often than lighter ones across seeds."""
    from bigdatafinalproject_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rows = [(i, 10 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_systematic_sample(df, "w", k=20, hash_cols=["id"], seed=3)
    got = sorted((r.pick, r.id) for r in out.collect())
    assert len(got) == 20
    assert [p for p, _ in got] == list(range(1, 21))
    # determinism across invocations
    again = sorted(
        (r.pick, r.id)
        for r in weighted_systematic_sample(
            df, "w", k=20, hash_cols=["id"], seed=3
        ).collect()
    )
    assert got == again


def test_systematic_selection_math_exact_k():
    """Pure-math property of the Madow predicate the sampler uses
    (hypothesis over random weight multisets): whenever every weight is
    <= W/k, exactly k items satisfy floor(k*cum/W) > floor(k*(cum-w)/W),
    and picks are 1..k in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=50), min_size=5, max_size=200),
        st.integers(min_value=1, max_value=20),
    )
    def check(ws, k):
        W = sum(ws)
        if max(ws) > W // k:  # bounded-weight precondition
            return
        cum, picks = 0, []
        for w in ws:
            lo, cum = cum, cum + w
            if (k * cum) // W > (k * lo) // W:
                picks.append((k * cum) // W)
        assert picks == list(range(1, k + 1))

    check()


def test_triangle_count_modes_agree(spark):
    """arrays (within-row intersect, fast at 16g) and wedges
    (constant-width rows, tight-heap-safe) are the same algorithm in
    two physical shapes — counts must be identical."""
    from bigdatafinalproject_spark.operators.graph import (
        copurchase_edges,
        triangle_count,
    )
    from bigdatafinalproject_spark.catalog import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    edges = copurchase_edges(li)
    a = triangle_count(edges, mode="arrays").collect()[0][0]
    w = triangle_count(edges, mode="wedges").collect()[0][0]
    assert a == w and a > 0


def test_dynamic_partition_overwrite_touches_only_written_partition(spark, tmp_path):
    """INSERT OVERWRITE semantics at the writer level: with
    partitionOverwriteMode=dynamic, overwriting a frame that contains
    only partition B must leave partition A's files and rows intact
    (static mode would wipe the whole table root) — the idempotent
    partition-level backfill primitive every warehouse job relies on."""
    path = str(tmp_path / "dyn")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, part string"
    )
    df.write.partitionBy("part").parquet(path)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        repl = spark.createDataFrame([(30, "b"), (31, "b")], "id long, part string")
        repl.write.mode("overwrite").partitionBy("part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    back = {(r.id, r.part) for r in spark.read.parquet(path).collect()}
    assert back == {(1, "a"), (2, "a"), (30, "b"), (31, "b")}


def test_weighted_systematic_sample_strict_raises_on_heavy_weight(spark):
    """strict=True surfaces the under-k case up front: one row heavier
    than W/k would absorb multiple marks, so the call raises instead of
    silently returning fewer than k rows."""
    import pytest

    from bigdatafinalproject_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rows = [(i, 1) for i in range(20)] + [(99, 1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    with pytest.raises(ValueError, match="exceeds"):
        weighted_systematic_sample(df, "w", k=5, hash_cols=["id"], strict=True)
    # non-strict stays lazy and returns the under-k result
    n = weighted_systematic_sample(df, "w", k=5, hash_cols=["id"]).count()
    assert n <= 5
    # strict on a bounded-weight input passes through unchanged
    ok = spark.createDataFrame([(i, 10) for i in range(100)], "id long, w long")
    assert (
        weighted_systematic_sample(ok, "w", k=5, hash_cols=["id"], strict=True).count()
        == 5
    )
