"""Connected components over near-duplicate pair graphs (net-new
surface): the step that turns candidate PAIRS (minhash/simhash/
embedding near-dups) into dedup CLUSTERS, so a pipeline can keep one
canonical doc per component.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Each round is
two rewrite steps over the edge list, each one groupBy + join on the
node key (two shuffles); the edge set converges to a forest of stars
whose centers are the component minima in O(log n) rounds — unlike
plain min-label propagation, which needs diameter-many rounds and so
degrades on long-path graphs (chains of near-dups linked pairwise).

  large-star: every node u computes m = min({u} ∪ N(u)) over its FULL
      (bidirected) neighborhood and reconnects each strictly-larger
      neighbor v > u directly to m — long tails fold onto local minima.
  small-star: on the (larger → smaller)-oriented result, every node u
      computes m = min of its smaller neighbors and reconnects itself
      and each smaller neighbor to m — stars flatten to their center.

Both steps preserve connectivity exactly (no approximation); the
fixpoint (edge set unchanged) is a set of (node → component-min) star
edges.

Lineage is cut with an eager localCheckpoint every round: iterative
self-referencing plans otherwise re-expand exponentially and re-sample
nondeterministic exchanges (the dense_ids landmine, NOTES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.barrier import materialize_barrier


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star step.

    Input: directed edges (s, d), d < s, distinct, no self-loops.
    Bidirects internally so each node sees its full neighborhood.
    Output: distinct (s, d) edges with d < s — every node v that had a
    strictly-smaller neighbor u is re-pointed at m = min({u} ∪ N(u)).
    """
    bi = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    mins = (
        bi.groupBy("s")
        .agg(F.min("d").alias("mn"))
        .select("s", F.least("s", "mn").alias("m"))
    )
    return (
        bi.join(mins, "s")
        .filter(F.col("d") > F.col("s"))
        .select(F.col("d").alias("s"), F.col("m").alias("d"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star step.

    Input/output: directed edges (s, d), d < s, distinct. Each node s
    re-points itself and all its smaller neighbors at the minimum of
    its smaller neighborhood.
    """
    mins = e.groupBy("s").agg(F.min("d").alias("m"))
    nbr = (
        e.join(mins, "s")
        .filter(F.col("d") != F.col("m"))
        .select(F.col("d").alias("s"), F.col("m").alias("d"))
    )
    self_e = mins.select("s", F.col("m").alias("d"))
    return nbr.unionByName(self_e).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it (= a canonical component id).

    Returns (node, component). Raises if the edge set has not reached
    its star-forest fixpoint within ``max_iterations`` rounds (one
    round = large-star + small-star) rather than silently returning
    partial components. ``max_iterations`` bounds O(log n) growth, so
    20 covers any graph that fits on a cluster.

    ``checkpoint_dir``: optional fault-tolerant directory — switches
    the per-round lineage cut from localCheckpoint to a reliable
    checkpoint so a long CC job survives executor loss
    (operators/barrier.py).

    ``stats``: optional dict; on return ``stats["rounds"]`` holds the
    number of large+small rounds executed (test instrumentation).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.greatest(F.col(src), F.col(dst)).alias("s"),
            F.least(F.col(src), F.col(dst)).alias("d"),
        )
        .distinct()
    )
    e = materialize_barrier(e, checkpoint_dir=checkpoint_dir)
    prev_count = e.count()

    for rounds in range(1, max_iterations + 1):
        new_e = materialize_barrier(
            _small_star(_large_star(e)), checkpoint_dir=checkpoint_dir
        )
        new_count = new_e.count()
        converged = (
            new_count == prev_count
            and new_e.exceptAll(e).limit(1).count() == 0
        )
        e, prev_count = new_e, new_count
        if converged:
            if stats is not None:
                stats["rounds"] = rounds
            return (
                nodes.join(e, nodes["node"] == e["s"], "left")
                .select(
                    "node",
                    F.coalesce(F.col("d"), F.col("node")).alias("component"),
                )
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
