"""Graph analytics + explicit skew-mitigation queries.

``part_pagerank`` exercises the iterative fixed-point PageRank
(operators/graph.py); the ``skew_salted_*`` queries drive the salting
operators (operators/skew.py) end-to-end so the skew tier has driver-
checked oracles, not just unit tests. Salting changes the PLAN, never
the RESULT — each oracle is the plain unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.operators.graph import (
    SCALE,
    copurchase_edges,
    pagerank_fixed_point,
    triangle_count,
)
from bigdatafinalproject_spark.operators.skew import salted_agg, salted_join
from bigdatafinalproject_spark.registry import query


def _pagerank_oracle(iters: int) -> str:
    """DuckDB replay of the exact int64 fixed-point updates."""
    cte = f"""
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS pr FROM deg)"""
    for i in range(1, iters + 1):
        cte += f""",
    pr{i} AS (SELECT e.dst AS node,
                     CAST(150000000000 + ((17 * SUM(p.pr // d.d)) // 20)
                          AS BIGINT) AS pr
              FROM edges e
              JOIN pr{i - 1} p ON p.node = e.src
              JOIN deg d ON d.src = e.src
              GROUP BY e.dst)"""
    return (
        "WITH" + cte + f"""
    SELECT node, pr, CAST(pr AS DOUBLE) / 1000000000000.0 AS pr_norm
    FROM pr{iters}"""
    )


@query("part_pagerank", oracle=_pagerank_oracle(3))
def part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph, 3 synchronous
    iterations in exact integer fixed-point (bit-reproducible across
    engines/partitionings — a float PageRank would drift with sum
    order). The iterative-algorithm family's driver-checked entry:
    barrier-frozen edge list, bounded per-basket pair generation."""
    li = load_table(spark, sf_dir, "lineitem")
    return pagerank_fixed_point(copurchase_edges(li), iters=3)


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-cardinality key
    (event_type: a handful of values -> a handful of reducers on a
    plain groupBy; at 100 TB each hot key's reducer takes the whole
    table). The salt spreads every key over 16 partial reducers; the
    final merge handles 16 rows per key. Decimal partials keep the
    merge exact, so the result equals the unsalted oracle bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_p"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s_p"),
        ],
        lambda p: [
            F.sum("n_p").alias("n_events"),
            F.sum("s_p").cast("double").alias("total_value"),
        ],
        salt_from="event_id",
        num_salts=16,
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_nationkey
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the big (event) side scatters each user over 8
    salts keyed on event_id; the customer dim is replicated 8x. Hot
    users therefore land on 8 reducers instead of 1 — the explicit
    mitigation for power-law keys where AQE skew-join doesn't apply
    (broadcast-ineligible dims, aggregation-after-join pipelines).
    Result is salt-invariant: oracle is the plain join."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    j = salted_join(e, c, on="user_id", num_salts=8, salt_from="event_id")
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("total_value"),
    )


@query(
    "part_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM items a JOIN items b USING (l_orderkey)
              WHERE a.l_partkey <> b.l_partkey),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    o AS (SELECT e.src, e.dst FROM edges e
          JOIN deg du ON du.node = e.src
          JOIN deg dv ON dv.node = e.dst
          WHERE (du.d < dv.d) OR (du.d = dv.d AND e.src < e.dst)),
    w AS (SELECT o1.src AS u, o1.dst AS v, o2.dst AS w2
          FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst <> o2.dst)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM w WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.v AND o.dst = w.w2)
    """,
)
def part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part co-purchase graph via
    degree-ordered orientation (operators/graph.triangle_count) — the
    wedge join whose out-degree cap survives power-law skew."""
    li = load_table(spark, sf_dir, "lineitem")
    return triangle_count(copurchase_edges(li))


@query(
    "part_bfs_reach",
    oracle="""
    WITH RECURSIVE
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b USING (l_orderkey)
      WHERE a.l_partkey <> b.l_partkey),
    walk(node, dist) AS (
      SELECT (SELECT MIN(src) FROM edges), 0
      UNION
      SELECT DISTINCT e.dst, w.dist + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.dist < 3),
    best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
    SELECT CAST(dist AS INT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_sum
    FROM best GROUP BY dist
    """,
)
def part_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the co-purchase graph (source = lowest
    part key in the edge list), 3 hops: per-hop reachable-node counts
    and the exact integer sum of reached node ids.

    The Spark side is frontier expansion (operators/graph.bfs_distances
    — visited nodes never re-expand, work is O(edges touched)); the
    oracle is the recursive-CTE statement of the same fixpoint, with a
    UNION + per-level DISTINCT so DuckDB explores node-levels, not
    paths. Same exact answer, two very different evaluation strategies
    — which is the point of the check."""
    from bigdatafinalproject_spark.operators.graph import bfs_distances

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    src = edges.agg(F.min("src").alias("node"))
    dists = bfs_distances(edges, src, max_hops=3)
    return (
        dists.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").cast("long").alias("node_sum"),
        )
    )
