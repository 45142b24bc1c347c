"""Interleaved A/B: r15 graph plan changes vs the r14 forms.

Arms alternate per rep in ONE session so host heat hits both equally
(the r14 measurement discipline). "old" monkeypatches
operators.graph.copurchase_edges back to the distinct-items self-join
and pagerank back to the deg-seeded SMJ iteration form; "new" is the
committed code. Results are bit-identical either way (oracle-gated);
this script only times.

Usage: python scripts/ab_graph.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdatafinalproject_spark import registry  # noqa: E402
from bigdatafinalproject_spark.operators import graph  # noqa: E402
from bigdatafinalproject_spark.operators.barrier import (  # noqa: E402
    materialize_barrier,
)
from bigdatafinalproject_spark.operators.layout import pin  # noqa: E402
from bigdatafinalproject_spark.session import get_spark  # noqa: E402

NEW_EDGES = graph.copurchase_edges
NEW_PR = graph.pagerank_fixed_point


def old_copurchase_edges(lineitem):
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


def old_pagerank_fixed_point(edges, iters=3, checkpoint_dir=None):
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = materialize_barrier(
        pin(edges.join(deg, "src"), "src"), checkpoint_dir
    )
    pr = deg.select(
        F.col("src").alias("node"),
        F.lit(graph.SCALE).cast("long").alias("pr"),
    )
    for _ in range(iters):
        contrib = ed.join(pr, ed["src"] == pr["node"]).select(
            F.col("dst"), F.expr("pr DIV d").alias("c")
        )
        pr = contrib.groupBy("dst").agg(
            F.expr(
                f"CAST({graph.TELEPORT} + (({graph.DAMP_NUM} * SUM(c)) "
                f"DIV {graph.DAMP_DEN}) AS BIGINT)"
            ).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
    return pr.select(
        "node", "pr",
        (F.col("pr") / F.lit(float(graph.SCALE))).alias("pr_norm"),
    )


NEW_BFS = graph.bfs_distances


def old_bfs_distances(edges, sources, max_hops=3, checkpoint_dir=None):
    edges = materialize_barrier(
        pin(edges.select("src", "dst"), "src"), checkpoint_dir
    )
    known = materialize_barrier(
        sources.select(F.col(sources.columns[0]).alias("node")).withColumn(
            "dist", F.lit(0)
        ),
        checkpoint_dir,
    )
    frontier = known
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(known.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = materialize_barrier(nxt, checkpoint_dir)
        known = known.unionByName(nxt)
        frontier = nxt
    return known


ARMS = {
    "old": (old_copurchase_edges, old_pagerank_fixed_point, old_bfs_distances),
    "new": (NEW_EDGES, NEW_PR, NEW_BFS),
}
QUERIES = ["part_pagerank", "part_bfs_reach", "part_triangle_count"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdfp-ab-graph")
    registry.QUERIES["popular_parts"](spark, sf_dir).count()

    import bigdatafinalproject_spark.queries.graph_skew as gq

    for qname in QUERIES:
        runs: dict[str, list[float]] = {a: [] for a in ARMS}
        for _ in range(reps):
            for arm, (ce, prf, bfs) in ARMS.items():
                graph.copurchase_edges = ce
                graph.pagerank_fixed_point = prf
                graph.bfs_distances = bfs
                gq.copurchase_edges = ce
                gq.pagerank_fixed_point = prf
                t0 = time.perf_counter()
                registry.QUERIES[qname](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs[arm].append(round(time.perf_counter() - t0, 3))
        graph.copurchase_edges = NEW_EDGES
        graph.pagerank_fixed_point = NEW_PR
        graph.bfs_distances = NEW_BFS
        gq.copurchase_edges = NEW_EDGES
        gq.pagerank_fixed_point = NEW_PR
        t0 = time.perf_counter()
        registry.QUERIES["popular_parts"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        print(
            json.dumps(
                {
                    "query": qname,
                    "runs": runs,
                    "median": {
                        a: statistics.median(v) for a, v in runs.items()
                    },
                    "pairwise_new_wins": sum(
                        1
                        for o, n_ in zip(runs["old"], runs["new"])
                        if n_ < o
                    ),
                    "canary_sec": round(time.perf_counter() - t0, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
