"""K-means clustering over embedding arrays (net-new ML surface beside
the ALS tier; replaces nothing in the reference — SURVEY §2.12 has no
clustering row — but a training-data pipeline needs it for corpus
bucketing / IVF coarse quantizers).

Determinism design (the whole point of this implementation):

- Init is data-deterministic: the k lowest-id vectors are the seed
  centroids (no rand()).
- Distances are sequential left-to-right double folds — the same fold
  ``list_reduce`` performs in DuckDB, so scores are bit-identical
  across engines (the ann_* precedent).
- Ties in the argmin break on centroid id via a struct-min aggregate —
  a map-side-combinable groupBy, not a window.
- Centroid updates are decimal-accumulated means (order-independent
  sums, one final double division) — engine- and partition-portable
  where a float mean would drift with row order.

MLlib's KMeans trades this determinism for k-means|| init and more
iterations; this operator is the oracle-checkable fixed-iteration twin
(and the coarse-quantizer trainer for operators/ann.ivf_topk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import davg


def _sq_dist(vec: Column, cent: Column) -> Column:
    """Sequential-fold squared L2 distance (bit-portable, see module)."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid per vector: broadcast the k centroids, struct-min
    (dist, cid) per vector. k is small by construction, so the cross
    join is k-fan-out map-side work, never a shuffle of the big side."""
    d = emb.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        _sq_dist(F.col(vec_col), F.col("centroid")).alias("dist"),
    )
    best = d.groupBy(id_col).agg(F.min(F.struct("dist", "cid")).alias("b"))
    return best.select(
        F.col(id_col), F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist")
    )


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    update_rounds: int = 1,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means: deterministic seed centroids, then
    ``update_rounds`` x (assign -> decimal-mean update), then a final
    assignment. Returns (id, cid, dist) against the final centroids."""
    from bigdatafinalproject_spark.operators.layout import spread

    emb = spread(emb, id_col)
    cents = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
    )
    for _ in range(update_rounds):
        assigned = _assign(emb, cents, id_col, vec_col)
        long = (
            emb.join(assigned.select(id_col, "cid"), id_col)
            .select(F.col("cid"), F.posexplode(vec_col).alias("dim", "val"))
        )
        means = long.groupBy("cid", "dim").agg(
            davg(F.col("val").cast("double")).alias("avg")
        )
        cents = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "avg"))),
                lambda s: s["avg"],
            ).alias("centroid")
        )
    return _assign(emb, cents, id_col, vec_col)
