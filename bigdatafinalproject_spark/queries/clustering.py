"""Clustering queries over the embeddings table (operators/clustering)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.clustering import kmeans_assign
from bigdatafinalproject_spark.registry import query

_SQDIST = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) "
    "* (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))), (acc, x) -> acc + x)"
)


@query(
    "embedding_kmeans",
    oracle=f"""
    WITH cent0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
      FROM embeddings WHERE vec_id < 8),
    d1 AS (
      SELECT e.vec_id, c.cid,
             {_SQDIST.format(a='e.embedding', b='c.centroid')} AS dist
      FROM embeddings e, cent0 c),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1),
    longv AS (
      SELECT a1.cid, CAST(u.i - 1 AS INT) AS dim,
             CAST(e.embedding[u.i] AS DOUBLE) AS val
      FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id,
           LATERAL unnest(generate_series(1, len(e.embedding))) AS u(i)),
    means AS (
      SELECT cid, dim,
             CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / COUNT(val) AS avg
      FROM longv GROUP BY cid, dim),
    cent1 AS (
      SELECT cid, list(avg ORDER BY dim) AS centroid FROM means GROUP BY cid),
    d2 AS (
      SELECT e.vec_id, c.cid,
             {_SQDIST.format(a='e.embedding', b='c.centroid')} AS dist
      FROM embeddings e, cent1 c)
    SELECT vec_id, cid, dist FROM (
      SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d2) WHERE rn = 1
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-iteration k-means (k=8, one Lloyd update):
    seed centroids = lowest-id vectors, sequential-fold distances,
    decimal-mean updates — every arithmetic step engine-portable, so
    the full iterate-update-reassign loop hash-matches DuckDB. The
    scale story: assignment is a broadcast k-fan-out (no big-side
    shuffle), the update one map-side-combinable groupBy per (cid,
    dim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=8, update_rounds=1)


_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)"
)

_SEMDEDUP_TAU = 0.3


@query(
    "doc_semantic_dedup",
    oracle=f"""
    WITH cent0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
      FROM embeddings WHERE vec_id < 8),
    d1 AS (
      SELECT e.vec_id, c.cid,
             {_SQDIST.format(a='e.embedding', b='c.centroid')} AS dist
      FROM embeddings e, cent0 c),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1),
    longv AS (
      SELECT a1.cid, CAST(u.i - 1 AS INT) AS dim,
             CAST(e.embedding[u.i] AS DOUBLE) AS val
      FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id,
           LATERAL unnest(generate_series(1, len(e.embedding))) AS u(i)),
    means AS (
      SELECT cid, dim,
             CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / COUNT(val) AS avg
      FROM longv GROUP BY cid, dim),
    cent1 AS (
      SELECT cid, list(avg ORDER BY dim) AS centroid FROM means GROUP BY cid),
    d2 AS (
      SELECT e.vec_id, c.cid,
             {_SQDIST.format(a='e.embedding', b='c.centroid')} AS dist
      FROM embeddings e, cent1 c),
    a2 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1),
    vv AS (
      SELECT e.vec_id, a2.cid,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS vec,
             sqrt({_DOT.format(a='e.embedding', b='e.embedding')}) AS nrm
      FROM embeddings e JOIN a2 ON a2.vec_id = e.vec_id),
    dropped AS (
      SELECT y.cid, y.vec_id
      FROM vv x JOIN vv y ON x.cid = y.cid AND x.vec_id < y.vec_id
      WHERE {_DOT.format(a='x.vec', b='y.vec')} / (x.nrm * y.nrm)
            >= {_SEMDEDUP_TAU}
      GROUP BY y.cid, y.vec_id),
    drops AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dropped,
             CAST(SUM(vec_id) AS BIGINT) AS dropped_id_sum
      FROM dropped GROUP BY cid)
    SELECT v.cid, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           COALESCE(ANY_VALUE(d.n_dropped), 0) AS n_dropped,
           COALESCE(ANY_VALUE(d.dropped_id_sum), 0) AS dropped_id_sum
    FROM vv v LEFT JOIN drops d ON d.cid = v.cid
    GROUP BY v.cid
    """,
)
def doc_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): coarse
    k-means clusters the corpus, then near-duplicate pruning runs ONLY
    within each cluster — a vector is dropped when a same-cluster
    neighbor with a LOWER id has cosine similarity >= tau (greedy
    keep-lowest, fully deterministic). Output is the per-cluster audit:
    cluster size, drop count, and the exact integer sum of dropped ids.

    Scale story: the quadratic step is confined inside clusters — at
    100 TB you grow k proportionally to N so the per-cluster candidate
    set stays bounded (the paper's design), making the self-join a
    cid-partitioned shuffle of bounded-size groups, never an all-pairs
    scan. Cosines are sequential left-to-right double folds (JVM-side
    ``zip_with``/``aggregate``), bit-identical to the oracle's
    ``list_reduce``."""
    from bigdatafinalproject_spark.operators.barrier import materialize_barrier

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, k=8, update_rounds=1).select("vec_id", "cid")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    vec = F.transform("embedding", lambda x: x.cast("double"))
    # barrier: v feeds BOTH the per-cluster size agg and both sides of
    # the pair self-join — without it the whole kmeans subtree runs 3x
    v = materialize_barrier(
        emb.join(assigned, "vec_id").select(
            "vec_id",
            "cid",
            vec.alias("vec"),
            F.sqrt(dot(vec, vec)).alias("nrm"),
        )
    )
    a = v.select(
        F.col("cid"),
        F.col("vec_id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    b = v.select(
        F.col("cid"),
        F.col("vec_id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    dropped = (
        a.join(b, "cid")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            dot(F.col("a_vec"), F.col("b_vec"))
            / (F.col("a_nrm") * F.col("b_nrm"))
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select("cid", F.col("b_id").alias("vec_id"))
        .distinct()
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_dropped"),
            F.sum("vec_id").alias("dropped_id_sum"),
        )
    )
    return (
        v.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .join(dropped, "cid", "left")
        .select(
            "cid",
            "n_vectors",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("dropped_id_sum", F.lit(0))
            .cast("long")
            .alias("dropped_id_sum"),
        )
    )


@query("embedding_pca_project")
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection (operators/pca): per-partition numpy
    partial Gram matrices -> kilobyte tree-reduce -> driver eigh on the
    d x d covariance -> broadcast literal components -> row-local fold
    projection. Rows-only by design (float sums are order-dependent so
    PCA is not bit-portable across engines); numerics pinned against a
    single-node numpy reference in tests/test_pca.py. Output is the
    scalar columns (vec_id, pc0..pc7) — not array<double>, which the
    driver's pandas canonicalizer cannot hash (CORRECTNESS_r04)."""
    from bigdatafinalproject_spark.operators.pca import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, "embedding", "vec_id", dim=64, k=8)
