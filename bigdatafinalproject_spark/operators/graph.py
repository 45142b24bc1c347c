"""Graph operators: co-occurrence edge extraction + fixed-point PageRank.

Net-new surface (the reference has no graph stage; its closest analogue
is the item-item co-occurrence implicit in similarity_matrix.py): a
basket co-purchase graph over lineitem and an iterative PageRank on it.

Design for 100 TB:

- Edge extraction is a per-basket self-join. TPC-H orders hold a
  bounded number of lineitems (<= 7), so the quadratic step is
  per-group-bounded — the same shape as ``basket_pair_lift``. For
  unbounded baskets, cap items per basket first (top-N by quantity).
- PageRank runs in *fixed-point integer arithmetic* (scale 1e12).
  Float PageRank sums contributions in partition order — results drift
  across engines, partition counts, and runs. Integer division and
  integer sums are exact and associative, so every iteration is
  bit-reproducible ANYWHERE (and DuckDB can replay it as an oracle).
  At web scale normalize the seed mass (SCALE // n_nodes) so the total
  mass — and therefore every intermediate sum — stays within int64.
- The edge list is shuffled to its join key once and frozen behind a
  ``materialize_barrier`` (localCheckpoint locally, reliable
  checkpoint on a cluster via ``checkpoint_dir``): each iteration
  re-reads the materialized edges instead of re-running the extraction
  plan, and the iterative lineage never grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.barrier import materialize_barrier
from bigdatafinalproject_spark.operators.layout import pin

SCALE = 10**12
TELEPORT = 150_000_000_000  # 0.15 * SCALE
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85 as an exact rational


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected (both directions materialized) distinct co-purchase
    edges: parts appearing in the same order. Per-order item counts are
    bounded, so the self-join is per-group quadratic, never global."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def pagerank_fixed_point(
    edges: DataFrame, iters: int = 3, checkpoint_dir: str | None = None
) -> DataFrame:
    """PageRank with damping 0.85, ``iters`` synchronous iterations,
    integer fixed-point arithmetic (see module docstring).

    PR_0(v) = SCALE;  PR_{k+1}(v) = TELEPORT
        + (17 * sum_{u->v} (PR_k(u) DIV deg(u))) DIV 20

    Every operation is exact int64 math — the update is associative and
    engine-portable. Undirected input means no dangling nodes.
    Returns (node, pr, pr_norm) where pr_norm = pr / 1e12.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = materialize_barrier(pin(edges.join(deg, "src"), "src"), checkpoint_dir)
    pr = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            F.col("dst"), F.expr("pr DIV d").alias("c")
        )
        pr = contrib.groupBy("dst").agg(
            F.expr(
                f"CAST({TELEPORT} + (({DAMP_NUM} * SUM(c)) DIV {DAMP_DEN}) AS BIGINT)"
            ).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
    return pr.select(
        "node", "pr", (F.col("pr") / F.lit(float(SCALE))).alias("pr_norm")
    )
