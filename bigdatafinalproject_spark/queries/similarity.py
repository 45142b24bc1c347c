"""Item-item similarity queries (SURVEY §7.6; replaces the reference's
pivot+sklearn similarity_matrix.py:36-48 with the sparse self-join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.similarity import item_cosine_pairs
from bigdatafinalproject_spark.registry import query


@query(
    "item_cosine_similarity",
    oracle="""
    WITH r0 AS (SELECT l_orderkey AS u, l_partkey AS i,
                       CAST(l_quantity AS DOUBLE) AS r FROM lineitem),
    r AS (SELECT u, i, r FROM (
            SELECT u, i, r,
                   row_number() OVER (PARTITION BY u ORDER BY r DESC, i ASC) AS rn
            FROM r0)
          WHERE rn <= 5),
    norms AS (SELECT i, sqrt(CAST(SUM(CAST(r * r AS DECIMAL(25,6))) AS DOUBLE)) AS norm
              FROM r GROUP BY i),
    pairs AS (SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_common,
                     SUM(CAST(a.r * b.r AS DECIMAL(25,6))) AS dot
              FROM r a JOIN r b ON a.u = b.u AND a.i < b.i
              GROUP BY 1, 2
              HAVING COUNT(*) >= 3)
    SELECT item_a, item_b, n_common,
           CAST(dot AS DOUBLE) / (na.norm * nb.norm) AS cosine
    FROM pairs JOIN norms na ON na.i = item_a JOIN norms nb ON nb.i = item_b
    ORDER BY cosine DESC, item_a ASC, item_b ASC
    LIMIT 100
    """,
)
def item_cosine_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 most-similar part pairs by basket (order) co-occurrence,
    quantity-weighted cosine. Orders play users, parts play items —
    the same user-item-rating shape as the reference's similarity
    matrix, minus the O(U×I) densification.

    ``max_per_user=5`` caps each basket to its 5 highest-quantity
    lines BEFORE the self-join: one heavy basket otherwise generates
    O(lines^2) pairs — the blow-up path on skewed co-occurrence data.
    The recall trade is explicit: pairs only co-counted through a
    basket's top-5 lines (the oracle replays the same cap), which is
    standard practice for co-occurrence similarity at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return item_cosine_pairs(
        li,
        user_col="l_orderkey",
        item_col="l_partkey",
        rating_col="l_quantity",
        min_common=3,
        max_per_user=5,
        top_n=100,
    )
