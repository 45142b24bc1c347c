"""Connected components over near-duplicate pair graphs (net-new
surface): the step that turns candidate PAIRS (minhash/simhash/
embedding near-dups) into dedup CLUSTERS, so a pipeline can keep one
canonical doc per component.

Algorithm: iterative min-label propagation — every node repeatedly
takes the minimum label among itself and its neighbors until fixpoint.
Each iteration is one join + one aggregation (two shuffles on the node
key); iterations needed = graph diameter. Near-dup graphs are
overwhelmingly tiny star/clique clusters (diameter <= 3), so this
converges in a handful of rounds; for adversarial long-path graphs the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") drops convergence to O(log n) rounds — the
per-round dataflow below is the same shape.

Lineage is cut with an eager localCheckpoint every round: iterative
self-referencing plans otherwise re-expand exponentially and re-sample
nondeterministic exchanges (the dense_ids landmine, NOTES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.barrier import materialize_barrier


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it (= a canonical component id).

    Returns (node, component). Raises if the graph has not converged
    within ``max_iterations`` (diameter larger than expected) rather
    than silently returning partial components.

    ``checkpoint_dir``: optional fault-tolerant directory — switches
    the per-round lineage cut from localCheckpoint to a reliable
    checkpoint so a long CC job survives executor loss
    (operators/barrier.py).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = materialize_barrier(e, checkpoint_dir=checkpoint_dir)

    labels = materialize_barrier(
        e.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        checkpoint_dir=checkpoint_dir,
    )

    for _ in range(max_iterations):
        nbr_labels = e.join(
            labels, e["d"] == labels["node"], "inner"
        ).select(F.col("s").alias("node"), "label")
        new_labels = materialize_barrier(
            labels.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label")),
            checkpoint_dir=checkpoint_dir,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
