"""Flagship: popularity top-k (SURVEY §7.2; reference ALS_model3.py:182-191).

lineitem plays the ratings fact (l_quantity as the rating-like measure),
part plays the item dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.popularity import popular_items_with_names
from bigdatafinalproject_spark.registry import query


@query(
    "popular_parts",
    oracle="""
    SELECT l_partkey, p_name,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_quantity)
               AS avg_rating,
           COUNT(l_quantity) AS num_ratings
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity > 0 AND l_quantity <= 50
    GROUP BY l_partkey, p_name
    HAVING COUNT(l_quantity) >= 20
    ORDER BY avg_rating DESC, num_ratings DESC, l_partkey ASC
    LIMIT 100
    """,
)
def popular_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    return popular_items_with_names(
        lineitem,
        part,
        item_col="l_partkey",
        rating_col="l_quantity",
        name_col="p_name",
        min_ratings=20,
        top_n=100,
        lo=0.0,
        hi=50.0,
    )
