"""Projection / filter / scalar-function operators (SURVEY §2.2, §2.8).

Covers: P1 select+alias, P2 cast, P3 range predicates + conjunction,
P4 (in)equality predicates, P5 null drop, P6 null imputation, P7
CASE WHEN, P8 rename, P11 distinct, scalar string/math functions, and
set operations (§2.7 — absent in the reference, present here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.registry import query


@query(
    "clean_project",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
           CAST(l_partkey AS VARCHAR)  AS item_id,
           CAST(floor(l_quantity) AS INT) AS rating
    FROM lineitem
    WHERE l_quantity > 0 AND l_quantity <= 50
      AND l_orderkey IS NOT NULL AND l_partkey IS NOT NULL AND l_quantity IS NOT NULL
    """,
)
def clean_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's load-and-clean shape (ALS_model3.py:197-201):
    select + cast + alias → range filter → na.drop. Catalyst pushes the
    quantity predicate into the parquet scan and prunes to 3 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return (
        # floor-then-cast, not a bare int cast: Spark truncates toward
        # zero but DuckDB CAST(DOUBLE AS INT) rounds half away from zero
        # — floor() pins ONE semantics in both engines for fractional
        # inputs (today's quantities are integral; the operator is not
        # allowed to depend on that)
        li.select(
            F.col("l_orderkey").cast("string").alias("order_id"),
            F.col("l_partkey").cast("string").alias("item_id"),
            F.floor("l_quantity").cast("int").alias("rating"),
        )
        .filter((q > 0) & (q <= 50))
        .na.drop(subset=["order_id", "item_id", "rating"])
    )


@query(
    "case_when_priority",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderpriority, price_band
    """,
)
def case_when_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN (P7, reference Model_evaluation.py:82-83) + group count."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band")
    )
    from bigdatafinalproject_spark.functions import dsum

    return (
        o.select("o_orderpriority", band, "o_totalprice")
        .groupBy("o_orderpriority", "price_band")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct (P11, reference ALS_model3.py:78,83)."""
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@query(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS acctbal_nn,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS acctbal_filled
    FROM customer
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null creation / imputation (P5/P6, reference similarity_matrix.py:38
    fillna(0) and ALS_model3.py:201 na.drop) — fillna expressed Spark-side
    with na.fill over a derived nullable column."""
    c = load_table(spark, sf_dir, "customer")
    acct_nn = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    out = c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "MACHINERY", "OTHER")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        acct_nn.alias("acctbal_nn"),
        acct_nn.alias("acctbal_filled"),
    )
    return out.na.fill({"acctbal_filled": 0.0})


@query(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 8))                    AS name_prefix,
           CAST(length(p_name) AS INT)                    AS name_len,
           p_partkey % 7                                  AS key_mod,
           round(p_retailprice, 1)                        AS price_r,
           concat(p_brand, ':', p_type)                   AS brand_type,
           abs(p_size - 25)                               AS size_dev,
           CAST(floor(p_retailprice / 100) AS BIGINT)     AS price_bucket,
           replace(p_type, ' ', '_')                      AS type_slug
    FROM part
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math surface (§2.8 — the reference used only `%` and
    driver-side `str[:12]`, model_report.py:45; this is the Spark-native
    superset)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.round("p_retailprice", 1).alias("price_r"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


@query(
    "set_operations",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cust_nations
                                          UNION SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cust_nations
                                              INTERSECT SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cust_nations
                                           EXCEPT SELECT nationkey FROM supp_nations)
    """,
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except (§2.7 — absent in the reference; its
    closest was a driver-side list extend, recommendations3.py:131-133)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    cd, sd = c.distinct(), s.distinct()
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(cd.union(sd).distinct(), "union")
        .unionByName(tag(cd.intersect(sd), "intersect"))
        .unionByName(tag(cd.exceptAll(sd).distinct(), "except"))
    )
