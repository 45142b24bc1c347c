"""Query registry: every implemented operator exposed as a named query.

This is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()``. Each entry maps a SURVEY.md §2 operator (or a net-new
LLM-pipeline operator) onto the driver's test star schema
(region/nation/customer/supplier/part/orders/lineitem/events/
documents/embeddings — TESTDATA.md).

Conventions (driver contract):
- every computed column is aliased IDENTICALLY in the Spark query and
  the DuckDB oracle SQL;
- float aggregates use the decimal-sum trick (functions.dsum/davg) so
  values are bit-identical across engines;
- hashes / pseudo-randomness use md5-derived portable hashes
  (functions.portable_hash64), never engine-native hash() or rand().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.popularity import popular_items_with_names

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable + its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship: popularity top-k (SURVEY §7.2; reference ALS_model3.py:182-191)
# lineitem plays the ratings fact (l_quantity as the rating-like measure),
# part plays the item dimension.
# --------------------------------------------------------------------------


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
