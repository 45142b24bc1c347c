"""Surrogate-id + split operators as oracle-checked queries
(SURVEY §7.3/§7.4; reference ALS_model3.py:75-107, 222-225).

The DuckDB oracles replay the exact same semantics with window
functions — possible only because the engine's splits use portable
md5-derived hashes instead of ``rand(seed)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import oracle_hash64
from bigdatafinalproject_spark.operators.ids import dense_ids, with_surrogate_key
from bigdatafinalproject_spark.operators.splits import (
    add_kfold,
    cold_start_filter,
    leave_n_out,
)
from bigdatafinalproject_spark.registry import query

_SEED = 42


@query(
    "dense_customer_ids",
    oracle="""
    SELECT c_name, row_number() OVER (ORDER BY c_name) - 1 AS customer_id
    FROM (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL)
    """,
)
def dense_customer_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0-based ids ordered by natural key, without the reference's
    global-window bottleneck (ALS_model3.py:75-87)."""
    c = load_table(spark, sf_dir, "customer")
    return dense_ids(c, "c_name", id_col="customer_id", num_partitions=8)


@query(
    "surrogate_join_back",
    oracle="""
    WITH mapping AS (
      SELECT c_name, row_number() OVER (ORDER BY c_name) - 1 AS customer_id
      FROM (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL))
    SELECT m.customer_id, COUNT(o_orderkey) AS n_orders
    FROM customer c
    JOIN mapping m USING (c_name)
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY m.customer_id
    """,
)
def surrogate_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mapping join-back (reference ALS_model3.py:205-208): facts keyed by
    the surrogate id downstream."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    mapping = dense_ids(c, "c_name", id_col="customer_id", num_partitions=8)
    keyed = with_surrogate_key(c, mapping, "c_name")
    return (
        keyed.join(o, keyed.c_custkey == o.o_custkey)
        .groupBy("customer_id")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def _kfold_oracle() -> str:
    h = oracle_hash64("o_custkey, o_orderkey", _SEED)
    return f"""
    WITH eligible AS (
      SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 7),
    ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY {h}, o_orderkey) AS rn,
             o_custkey IN (SELECT o_custkey FROM eligible) AS elig
      FROM orders)
    SELECT CAST(CASE WHEN elig THEN (rn - 1) % 5 ELSE -1 END AS INT) AS fold,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_users
    FROM ranked GROUP BY fold
    """


@query("kfold_assignment", oracle=_kfold_oracle())
def kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user k-fold split (reference ALS_model3.py:89-107): orders play
    ratings, custkey plays user. Balanced folds for eligible users,
    fold=-1 always-train for sub-threshold users."""
    o = load_table(spark, sf_dir, "orders")
    folds = add_kfold(o, "o_custkey", "o_orderkey", k=5, min_ratings=7, seed=_SEED)
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_users"),
    )


def _leave_one_out_oracle() -> str:
    h = oracle_hash64("o_custkey, o_orderkey", _SEED)
    return f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY {h}, o_orderkey) AS rn
      FROM orders)
    SELECT CASE WHEN rn <= 1 THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_users
    FROM ranked GROUP BY split
    """


@query("leave_one_out_split", oracle=_leave_one_out_oracle())
def leave_one_out_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out per user (reference ALS_model3.py:222-225): every
    user contributes exactly one test row."""
    o = load_table(spark, sf_dir, "orders")
    split = leave_n_out(o, "o_custkey", "o_orderkey", n=1, seed=_SEED)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_users"),
    )


def _cold_start_oracle() -> str:
    h = oracle_hash64("l_suppkey, concat_ws('-', l_orderkey, l_linenumber, l_partkey)", _SEED)
    return f"""
    WITH ranked AS (
      SELECT l_suppkey, l_partkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY {h}, concat_ws('-', l_orderkey, l_linenumber, l_partkey)) AS rn
      FROM lineitem),
    test AS (SELECT * FROM ranked WHERE rn <= 5),
    train AS (SELECT * FROM ranked WHERE rn > 5)
    SELECT COUNT(*) AS n_test_filtered
    FROM test
    WHERE l_suppkey IN (SELECT DISTINCT l_suppkey FROM train)
      AND l_partkey IN (SELECT DISTINCT l_partkey FROM train)
    """


@query("cold_start_filtered_count", oracle=_cold_start_oracle())
def cold_start_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start semi-join filter (reference ALS_model3.py:140-142):
    test rows restricted to train-seen users AND items, as native
    left-semi joins. Suppliers play users, parts play items."""
    # _item includes partkey so hash-order ties are partkey-identical
    # (the synthetic lineitem has duplicate (orderkey, linenumber) pairs)
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_item", F.concat_ws("-", "l_orderkey", "l_linenumber", "l_partkey")
    )
    split = leave_n_out(li, "l_suppkey", "_item", n=5, seed=_SEED)
    test = split.filter(F.col("split") == "test")
    train = split.filter(F.col("split") == "train")
    filtered = cold_start_filter(test, train, "l_suppkey", "l_partkey")
    return filtered.agg(F.count(F.lit(1)).alias("n_test_filtered"))
