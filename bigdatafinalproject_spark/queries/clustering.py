"""Clustering queries over the embeddings table (operators/clustering)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


@query("embedding_pca_project")
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection (operators/pca): per-partition numpy
    partial Gram matrices -> kilobyte tree-reduce -> driver eigh on the
    d x d covariance -> broadcast literal components -> row-local fold
    projection. Rows-only by design (float sums are order-dependent so
    PCA is not bit-portable across engines); numerics pinned against a
    single-node numpy reference in tests/test_pca.py."""
    from bigdatafinalproject_spark.operators.pca import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, "embedding", "vec_id", dim=64, k=8)
