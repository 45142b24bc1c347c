"""Join operators (SURVEY §2.3): inner, broadcast, left, semi, anti,
multi-way star join.

Scale notes: small dims (region/nation) are always broadcast; the
fact-fact joins shuffle on their keys and rely on AQE for skew. Semi/
anti joins are expressed natively (the reference emulated the semi with
inner-joins-on-distinct, ALS_model3.py:140-142, and the anti with a
driver-side list comprehension, recommendations3.py:130-133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.registry import query


@query(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (J5) — native, replacing the reference's
    inner-join-on-distinct emulation (ALS_model3.py:140-142)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_semi"
    ).select("c_custkey", "c_name")


@query(
    "customers_without_orders_anti",
    oracle="""
    -- NOT EXISTS, not NOT IN: a NULL o_custkey would make NOT IN return
    -- zero rows while left_anti (correctly) keeps unmatched customers
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (J6) — native, replacing the reference's driver-side
    `not in seen` backfill filter (recommendations3.py:130-133)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_name")


@query(
    "left_join_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,6))), 0) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER (J4, reference open_session.py:87) with null-aware
    aggregation — customers with zero orders keep count 0 / spend 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(25,6)")), F.lit(0))
        .cast("double")
        .alias("spend"),
    )


@query(
    "star_join_revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    GROUP BY r_name, n_name
    """,
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J1/J2/J3): two fact shuffles + broadcast dims.

    TPC-H Q5-shaped; nation/region are broadcast explicitly (they are
    fixed-size at any SF), customer is left to Catalyst/AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "full_outer_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (absent in the reference, §2.3 'absent' row):
    customer vs supplier presence per nation, zero-filled."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, on="nationkey", how="full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "broadcast_dim_join",
    oracle="""
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hint join (J3, reference recommendations3.py:73)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@query(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(l_linenumber % 3, 0) AS k,
             CAST(COUNT(*) AS BIGINT) AS cnt_a
      FROM lineitem GROUP BY 1),
    b AS (
      SELECT NULLIF(o_orderkey % 3, 0) AS k,
             CAST(COUNT(*) AS BIGINT) AS cnt_b
      FROM orders GROUP BY 1)
    SELECT a.k, a.cnt_a, b.cnt_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM — SURVEY §2.3
    'absent' family): NULL keys match each other instead of dropping
    out, the semantic needed when joining on nullable dimension keys.
    Spark plans it as a regular hash join on the coalesced key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    a = (
        li.select(F.nullif(F.col("l_linenumber") % 3, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    b = (
        o.select(F.nullif(F.col("o_orderkey") % 3, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "cnt_a", "cnt_b")
    )
