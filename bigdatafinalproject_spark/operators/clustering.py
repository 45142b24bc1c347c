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
    """Sequential-fold squared L2 distance (bit-portable, see module).
    Element casts to double BEFORE the subtract so float inputs and
    double (trained-mean) inputs fold identically in both engines."""
    return F.aggregate(
        F.zip_with(
            vec,
            cent,
            lambda x, c: (x.cast("double") - c.cast("double"))
            * (x.cast("double") - c.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest centroid per vector: broadcast the k centroids, struct-min
    (dist, cid) per vector. k is small by construction, so the cross
    join is k-fan-out map-side work, never a shuffle of the big side.
    With ``group_cols`` (e.g. a PQ subspace index) the centroid join and
    the argmin are scoped per group — one plan trains every group.

    Batch frames dispatch to the Arrow kernel
    (operators/arrow_kernels.argmin_centroids_arrow): same
    dim-sequential arithmetic and tie rule, vectorized in numpy
    instead of Spark's interpreted HOF path, with the k centroids
    collected once (bounded — the same rows this plan broadcast).
    The kernel supports at most ONE group column
    (collect_grouped_centroids keys on group_cols[0]); composite group
    keys keep the expression form (ADVICE r14)."""
    if len(group_cols) <= 1 and not (emb.isStreaming or cents.isStreaming):
        from bigdatafinalproject_spark.operators.arrow_kernels import (
            argmin_centroids_arrow,
        )

        return argmin_centroids_arrow(emb, cents, id_col, vec_col, group_cols)
    joined = (
        emb.join(F.broadcast(cents), on=list(group_cols))
        if group_cols
        else emb.crossJoin(F.broadcast(cents))
    )
    d = joined.select(
        F.col(id_col),
        *[F.col(g) for g in group_cols],
        F.col("cid"),
        _sq_dist(F.col(vec_col), F.col("centroid")).alias("dist"),
    )
    best = d.groupBy(id_col, *group_cols).agg(
        F.min(F.struct("dist", "cid")).alias("b")
    )
    return best.select(
        F.col(id_col),
        *[F.col(g) for g in group_cols],
        F.col("b.cid").alias("cid"),
        F.col("b.dist").alias("dist"),
    )


def kmeans_centroids(
    emb: DataFrame,
    init: DataFrame,
    rounds: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_cols: tuple[str, ...] = (),
    parallelism: int | None = None,
) -> DataFrame:
    """Train centroids with ``rounds`` deterministic Lloyd updates from
    an explicit ``init`` frame of (group_cols..., cid, centroid) — the
    coarse-quantizer / PQ-codebook trainer for operators/ann (the r7
    verdict's top item: replace trainless sampled quantizers with
    trained ones while keeping every arithmetic step oracle-portable).

    Each round: broadcast-assign (sequential-fold L2, ties to lowest
    cid) then decimal-mean update per (group, cid, dim) — one
    map-side-combinable groupBy, order-independent sums, one final
    double division. A cid that loses all members simply drops out of
    the next round (both engines GROUP BY only non-empty cells).
    Returns (group_cols..., cid, centroid<array<double>>).

    The training corpus is REPARTITIONED across defaultParallelism
    first (r11): the N×C assign pass is map-side work that inherits
    the input partitioning, and a skewed source layout (one fat
    parquet row group) serializes the trainer onto one task per round
    — at sf10 with the scheduled C=512 that straggler was an hour of
    single-core Lloyd. Unconditional repartition rather than the
    probing ``spread`` (r11 review #2): ``df.rdd.getNumPartitions()``
    under AQE eagerly materializes any upstream exchanges as a
    throwaway job (the PQ codebook trainer's subvec frame carries a
    window + join), while an adjacent redundant repartition is
    collapsed by Catalyst's CollapseRepartition for free. Content-
    neutral by design: the decimal-mean updates are order-independent
    sums (module doc), so trained centroids are bit-identical under
    any partitioning.

    Optimization r14: the Lloyd loop is driver-stepped — each round is
    ONE Spark job (Arrow argmin kernel carrying the vector through ->
    posexplode -> decimal-mean aggregate -> bounded collect of the
    k x dim means), and the next round's centroids ride into the
    kernel closure instead of re-executing the previous round's
    subtree inside a broadcast exchange. The decimal-mean aggregation
    itself is untouched (that is the cross-engine-exact step), so
    trained centroids are bit-identical to the unrolled-plan form; the
    returned frame is a LITERAL (createDataFrame of the k rows), which
    makes every downstream broadcast/collect of it free.

    EAGER-EXECUTION CONTRACT (ADVICE r14): the driver-stepped loop
    runs one Spark job per round AT CALL TIME — call it only when
    training should actually run, and never on a streaming-rooted
    frame (raised below; the pre-r14 lazy form silently deferred)."""
    import numpy as np

    if emb.isStreaming or init.isStreaming:
        raise ValueError(
            "kmeans_centroids is eager (one Spark job per Lloyd round "
            "at call time) and cannot train on a streaming frame — "
            "train on the batch corpus and freeze the centroids"
        )

    from bigdatafinalproject_spark.operators.arrow_kernels import (
        argmin_centroids_arrow,
        collect_grouped_centroids,
    )

    from bigdatafinalproject_spark.operators.layout import (
        scaled_parallelism,
    )

    spark = emb.sparkSession
    # r14: the round job's partition count follows the DATA (plan-stats
    # bytes / 4 MB, clamped to the core count) instead of a core-count
    # constant — at sf0.1 the whole round fits one task cheaper than 32
    # near-empty ones, at sf30 it sizes back up. ``parallelism`` lets
    # callers with a checkpoint-rooted training frame (no usable stats)
    # pass the corpus-derived figure down.
    emb = emb.repartition(
        parallelism or scaled_parallelism(emb), F.col(id_col)
    )
    gcol = group_cols[0] if group_cols else None
    groups = collect_grouped_centroids(init, gcol)
    for _ in range(rounds):
        assigned = argmin_centroids_arrow(
            emb, groups, id_col, vec_col, group_cols, carry_vec=True
        )
        means = (
            assigned.select(
                *[F.col(g) for g in group_cols],
                F.col("cid"),
                F.posexplode(vec_col).alias("dim", "val"),
            )
            .groupBy(*group_cols, "cid", "dim")
            .agg(davg(F.col("val").cast("double")).alias("avg"))
            .collect()
        )
        by_key: dict[tuple[int, int], list[tuple[int, float]]] = {}
        for r in means:
            g = int(r[0]) if group_cols else 0
            by_key.setdefault((g, r["cid"]), []).append((r["dim"], r["avg"]))
        groups = {}
        for g in sorted({k[0] for k in by_key}):
            cids = sorted(k[1] for k in by_key if k[0] == g)
            mat = np.array(
                [[v for _, v in sorted(by_key[(g, cid)])] for cid in cids],
                dtype=np.float64,
            )
            groups[g] = (np.array(cids, dtype=np.int64), mat)
    rows = [
        ((int(g),) if group_cols else ()) + (int(cid), [float(x) for x in cvec])
        for g, (cids, mat) in sorted(groups.items())
        for cid, cvec in zip(cids, mat)
    ]
    schema = (
        f"{gcol} int, " if group_cols else ""
    ) + "cid bigint, centroid array<double>"
    return spark.createDataFrame(rows, schema)


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
    init = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
    )
    cents = kmeans_centroids(emb, init, update_rounds, id_col, vec_col)
    return _assign(emb, cents, id_col, vec_col)
