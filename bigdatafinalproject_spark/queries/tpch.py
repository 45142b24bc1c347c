"""TPC-H classic query suite over the driver's star schema.

The reference is a recommendation pipeline, but "same query
capabilities, Spark-first" means a user must be able to run the
standard warehouse workload too. This module carries the canonical
TPC-H queries that are expressible over the driver's TPC-H-ish tables
(TESTDATA.md) and not already present elsewhere in the registry
(Q1 = ``pricing_summary``, Q3 = ``top_orders_by_revenue``,
Q5-shaped = ``star_join_revenue_by_nation``).

Schema adaptations (the test tables carry a column subset — every
divergence from the spec text is noted per query):
- no ``partsupp``, ``l_commitdate``/``l_receiptdate``,
  ``l_shipmode``/``l_shipinstruct``, ``p_container``/``p_mfgr``,
  ``c_phone``/``c_address``, ``o_shippriority``/``o_clerk``.
- dates are TIMESTAMP columns; predicates use the spec's date
  boundaries shifted into the generator's 1995-2001 range.

Portability discipline (registry conventions): revenue sums go through
``dsum`` (decimal accumulation, order-independent), averages through
``davg`` (double division last), counts cast to BIGINT, and every
computed column is aliased identically in Spark and the oracle.

Scale notes: each query is the textbook plan — fact-side filters
pushed to the scan, dimension sides broadcast (nation/region always;
part/supplier filters cut them to broadcast size), aggregations
partial+final. Plans are linted with every other registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import davg, dsum
from bigdatafinalproject_spark.registry import query

_REV_SQL = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 365 DAYS)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders from one quarter with
    at least one late line, counted per priority. Adaptation: the spec's
    lateness test (l_commitdate < l_receiptdate) uses columns the test
    schema lacks; 'shipped more than a year after ordering' stands in.

    The EXISTS compiles to a LEFT SEMI join — the fact side is filtered
    to one quarter BEFORE the join, and the semi join never duplicates
    orders however many lines are late."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REV_SQL} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume), faithful: revenue per nation
    for one region and one year where the SUPPLIER sits in the
    customer's nation (the co-location equi-condition that
    star_join_revenue_by_nation deliberately omits).

    nation/region broadcast; the c_nationkey = s_nationkey condition
    rides the l_suppkey equi-join as a post-join filter, so no extra
    shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), faithful: one scan, every
    predicate pushed into the parquet reader (shipdate range is a
    row-group min/max prune), one global partial+final aggregate —
    the canonical scan-efficiency query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {_REV_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), faithful: trade volume between two
    nations in both directions, per ship year. The two nation lookups
    broadcast (aliased copies of the 25-row dim); the pair predicate
    runs after both joins, cutting the aggregate input to the two
    nations before the groupBy shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), faithful modulo the date
    window (all years kept — the generator's range is short): the
    share of ASIA's ECONOMY-part revenue supplied by NATION_3,
    per order year. The conditional-sum / total-sum division happens
    once per year group, AFTER both decimal sums — exactly the
    spec's sum(case)/sum shape, bit-portable because the division is
    the last double op."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_name")
    )
    rev = _rev()
    nat_rev = F.when(F.col("supp_name") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_region"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((dsum(nat_rev) / dsum(rev)).alias("mkt_share"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {_REV_SQL} AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), adapted: the spec's profit
    subtracts ps_supplycost from a partsupp table the test schema does
    not carry, so profit degrades to discounted revenue; the
    name-substring part filter, supplier-nation grouping, and
    per-order-year breakdown are faithful. The filtered part dim
    broadcasts; lineitem shuffles once per equi-join chain."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(_rev()).alias("sum_profit"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV_SQL} AS revenue, ANY_VALUE(c_acctbal) AS c_acctbal,
           ANY_VALUE(n_name) AS n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting), faithful: top-20 customers
    by revenue lost to returns in one quarter. The final ordering is a
    TakeOrderedAndProject (top-k, never a global sort); c_custkey
    breaks revenue ties so the LIMIT is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(_rev()).alias("revenue"),
            F.any_value("c_acctbal").alias("c_acctbal"),
            F.any_value("n_name").alias("n_name"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), faithful minus the spec's
    comment-pattern exclusion (no o_comment column): how many customers
    placed 0, 1, 2 ... orders. The LEFT join keeps zero-order
    customers; COUNT(o_orderkey) ignores the NULLs the outer join
    introduces. Two cheap aggregations, both map-side combinable."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), faithful (p_type here is the bare
    class enum, so equality replaces LIKE 'PROMO%'): percent of one
    month's revenue from promo parts. One month of lineitem joins the
    part dim (broadcast); the case/total division is the final double
    op on two decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS a_key,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON a_key = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), faithful minus the
    p_container conjunct (column absent): revenue locked in orders of
    one brand below 20% of the part's average quantity. Catalyst plans
    the correlated avg as one extra aggregate over lineitem joined
    back on partkey — two scans of the fact, zero nested loops; the
    davg division happens per part AFTER the decimal sum, so the 0.2 *
    avg threshold is bit-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("a_key")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("a_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS b_key
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 300)
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN big      ON b_key = o_orderkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customer), faithful: orders whose total
    quantity exceeds 300 units, with their customers. The HAVING
    subquery is a semi-join-shaped aggregate over lineitem only —
    orders/customer join the (small) qualifying set, then lines are
    re-aggregated for the output quantity. Decimal quantity sums make
    the >300 cut exact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_key"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("b_key")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("b_key") == F.col("o_orderkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            "total_qty",
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {_REV_SQL} AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: the spec's container
    and ship-instruction conjuncts use absent columns; the three OR'd
    (brand, size range, quantity range) arms are faithful. One
    broadcast join then a disjunctive residual filter — the point is
    that Catalyst keeps the whole disjunction as one post-join
    predicate instead of three unioned scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    arm = lambda b, hi, q1, q2: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, hi)
        & (q >= q1)
        & (q <= q2)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            arm("Brand#1", 15, 1, 11)
            | arm("Brand#2", 25, 10, 20)
            | arm("Brand#3", 35, 20, 30)
        )
        .agg(
            dsum(_rev()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(c_acctbal) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the spec's phone
    country code (no c_phone column) becomes c_nationkey — same
    'group prospects by country' semantics. Above-average-balance
    customers with no RECENT (1999+) orders (every sf0.01 customer has SOME order, so the spec's any-order form is vacuous here): the scalar average broadcasts as a
    1-row crossJoin, the NOT EXISTS is a LEFT ANTI join, and the
    davg division runs once globally — all three sub-shapes exactly
    what the spec's decorrelated plan does."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier), faithful: the supplier(s) whose
    3-month revenue equals the maximum over all suppliers — the spec's
    revenue view + scalar MAX subquery, here as one reused aggregate
    (computed once behind a barrier, read by both the MAX and the
    equality filter) joined to the supplier dim.

    Equality on total_revenue is safe cross-engine because both sides
    come from the same decimal-sum pipeline — bit-identical doubles."""
    from bigdatafinalproject_spark.operators.barrier import materialize_barrier

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue0 = materialize_barrier(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            dsum(_rev()).alias("total_revenue")
        )
    )
    mx = revenue0.agg(F.max("total_revenue").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue0, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q12_late_lines_by_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 180 DAYS
    GROUP BY l_returnflag
    """,
)
def tpch_q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: the spec
    buckets late lines by l_shipmode and splits counts into
    high/low-priority CASE sums; without shipmode/commit/receipt
    columns, l_returnflag stands in as the line class and 'shipped
    more than 180 days after ordering' as the lateness test — the
    high/low CASE-sum split and one-quarter..one-year windowing are
    the faithful part. One fact-side filter + one equi-join + one
    map-side-combinable aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the test schema has no partsupp table, so the four
# classics that need one (Q2/Q11/Q16/Q20) DERIVE it deterministically —
# each part lists 4 supplier slots whose suppkey/supplycost/availqty are
# md5-hash functions of (partkey, slot), deduped to one row per
# (part, supplier) pair. The derivation is part of the query and replays
# bit-for-bit in the oracle, so these are exact correctness rows for the
# queries' JOIN/HAVING/decorrelation shapes — the data is synthetic, the
# operator semantics are the spec's.
# ---------------------------------------------------------------------------

from bigdatafinalproject_spark.functions import oracle_hash64, portable_hash64  # noqa: E402

_PS_SLOTS = 4

_PS_CTE = f"""
    ps0 AS (
      SELECT p_partkey,
             {oracle_hash64('p_partkey, u.slot', seed=71)}
                 % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
             10000 + {oracle_hash64('p_partkey, u.slot', seed=72)} % 90000
                 AS cost_cents,
             1 + {oracle_hash64('p_partkey, u.slot', seed=73)} % 9999 AS avail
      FROM part, LATERAL unnest(range(0, {_PS_SLOTS})) AS u(slot)),
    psd AS (
      SELECT p_partkey AS ps_partkey, ps_suppkey,
             MIN(cost_cents) AS ps_supplycost_cents,
             MAX(avail) AS ps_availqty
      FROM ps0 GROUP BY 1, 2)
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_supplycost_cents, ps_availqty) —
    4 hash-derived slots per part, deduped per (part, supplier) by
    MIN(cost)/MAX(avail). Cost stays integer cents so every aggregate
    over it is exact. Row-local derivation + one groupBy: scales as a
    map + single shuffle of 4x|part| rows."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    ns = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("_ns")
    )
    slots = (
        p.crossJoin(F.broadcast(ns))
        .select(
            "p_partkey",
            "_ns",
            F.explode(
                F.array(*[F.lit(i) for i in range(_PS_SLOTS)])
            ).alias("slot"),
        )
    )
    h = lambda seed: portable_hash64(  # noqa: E731
        F.col("p_partkey"), F.col("slot"), seed=seed
    )
    return (
        slots.select(
            F.col("p_partkey").alias("ps_partkey"),
            (h(71) % F.col("_ns")).alias("ps_suppkey"),
            (F.lit(10000) + h(72) % 90000).alias("_cost_cents"),
            (F.lit(1) + h(73) % 9999).alias("_avail"),
        )
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.min("_cost_cents").alias("ps_supplycost_cents"),
            F.max("_avail").alias("ps_availqty"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE},
    eur AS (
      SELECT psd.*, s_acctbal, s_name, n_name
      FROM psd
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'),
    best AS (
      SELECT ps_partkey AS b_key, MIN(ps_supplycost_cents) AS b_cost
      FROM eur GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
    FROM eur
    JOIN part ON p_partkey = ps_partkey
    JOIN best ON b_key = ps_partkey AND ps_supplycost_cents = b_cost
    WHERE p_size = 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier) over the derived partsupp:
    for size-15 parts, the EUROPE supplier(s) matching each part's
    region-minimum supply cost, top-20 by account balance. The spec's
    correlated MIN subquery is written as its decorrelated form — one
    per-part MIN aggregate joined back — which is exactly what Catalyst
    produces for the subquery and the only shape that scales. Integer
    cents make the MIN-equality exact; cost turns into dollars only at
    output. ``eur`` feeds both the MIN aggregate and the final join, so
    it is frozen behind a materialize_barrier (the repo's
    barrier-before-fanout discipline — same pattern as Q15/Q21)."""
    from bigdatafinalproject_spark.operators.barrier import materialize_barrier

    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eur = materialize_barrier(
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    best = eur.groupBy(F.col("ps_partkey").alias("b_key")).agg(
        F.min("ps_supplycost_cents").alias("b_cost")
    )
    return (
        eur.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            best,
            (F.col("b_key") == F.col("ps_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("b_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias(
                "supplycost"
            ),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_PS_CTE},
    natps AS (
      SELECT ps_partkey,
             ps_supplycost_cents * ps_availqty AS v
      FROM psd JOIN supplier ON s_suppkey = ps_suppkey
      WHERE s_nationkey = 5),
    tot AS (SELECT SUM(v) AS t FROM natps)
    SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
    FROM natps, tot
    GROUP BY ps_partkey, t
    HAVING SUM(v) * 1000 > t
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) over the derived
    partsupp: parts whose stock value at NATION_5 suppliers exceeds
    0.1% of that nation's total. The spec's scalar total becomes a
    1-row broadcast; the fraction test runs in EXACT integer
    arithmetic (value*1000 > total — no double threshold at any
    scale)."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 5)
    natps = ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
    )
    tot = natps.agg(F.sum("v").alias("t"))
    return (
        natps.groupBy("ps_partkey")
        .agg(F.sum("v").cast("long").alias("value_cents"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("t"))
        .select("ps_partkey", "value_cents")
    )


@query(
    "tpch_q16_parts_supplier_counts",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM psd JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) over the derived
    partsupp: distinct supplier counts per (brand, type, size) for an
    excluded-brand, size-list part subset. Adaptation: the spec also
    excludes suppliers with complaint comments — no comment column.
    The distinct-agg is the query's point: partial aggregation
    dedups (group, supplier) pairs map-side before the count."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PS_CTE},
    shipped AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                 AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey)
    SELECT s_suppkey, s_name,
           CAST(COUNT(*) AS BIGINT) AS n_excess_parts
    FROM supplier
    JOIN psd  ON ps_suppkey = s_suppkey
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
    LEFT JOIN shipped ON l_partkey = ps_partkey
    WHERE CAST(ps_availqty AS DOUBLE) > 20.0 * COALESCE(q, 0.0)
    GROUP BY s_suppkey, s_name
    """,
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) over the derived partsupp:
    per supplier, how many 'red'-part stock positions exceed 20x the
    part's yearly shipped quantity. Adaptations: shipped quantity is
    per PART (the derived pairs are independent of lineitem's supplier
    column), and the output counts qualifying positions per supplier
    rather than a bare DISTINCT list (the synthetic avail >> shipped
    ratio makes pure existence vacuous — the count discriminates).
    Shape preserved: filtered dim broadcast, per-part shipped-quantity
    aggregate joined in, supplier-level aggregation."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey").agg(
        dsum(F.col("l_quantity")).alias("q")
    )
    return (
        s.join(ps, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(shipped, F.col("l_partkey") == F.col("ps_partkey"), "left")
        .filter(
            F.col("ps_availqty").cast("double")
            > 20.0 * F.coalesce(F.col("q"), F.lit(0.0))
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             (1 + {oracle_hash64('l_orderkey, l_linenumber', seed=81)} % 30)
               > ({oracle_hash64('l_orderkey, l_linenumber', seed=82)} % 90)
                 AS is_late
      FROM lineitem),
    multi AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS ns FROM li GROUP BY 1),
    latecnt AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nls
      FROM li WHERE is_late GROUP BY 1)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM li
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN multi    ON multi.l_orderkey = li.l_orderkey
    JOIN latecnt  ON latecnt.l_orderkey = li.l_orderkey
    WHERE li.is_late AND n_name = 'NATION_4' AND o_orderstatus = 'F'
      AND multi.ns > 1 AND latecnt.nls = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the last of the
    22 classics. Adaptation: the schema has no commit/receipt dates,
    so the spec's lateness test (l_receiptdate > l_commitdate) becomes
    a derived pair of hash day-offsets per line (ship+1..30 receipt
    vs ship+0..89 commit slack, ~17% late) compared as integers —
    replayed bit-for-bit by the oracle.

    The spec's correlated EXISTS / NOT EXISTS pair is written in its
    decorrelated form: 'another supplier exists in the order' is a
    distinct-supplier count > 1, and 'no OTHER supplier was late' is a
    distinct-LATE-supplier count of exactly 1 (the probe line itself
    is late) — two per-order aggregates joined back, no correlated
    re-execution, which is the only shape that scales."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            (
                F.lit(1)
                + portable_hash64(
                    F.col("l_orderkey"), F.col("l_linenumber"), seed=81
                )
                % 30
            )
            > portable_hash64(
                F.col("l_orderkey"), F.col("l_linenumber"), seed=82
            )
            % 90
        ).alias("is_late"),
    )
    # the derived frame feeds BOTH the probe side and the per-order
    # counts: barrier it so the 2x|lineitem| md5 derivations run once
    from bigdatafinalproject_spark.operators.barrier import materialize_barrier

    li = materialize_barrier(li)
    # ONE per-order aggregate pass carries both decorrelated counts
    # (all suppliers + late suppliers) — a second groupBy over the fact
    # would shuffle it twice for no reason
    percnt = li.groupBy(F.col("l_orderkey").alias("m_key")).agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("nls"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        li.filter("is_late")
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            percnt,
            (F.col("m_key") == F.col("l_orderkey"))
            & (F.col("ns") > 1)
            & (F.col("nls") == 1),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------
# Suite-completion aliases: Q1 and Q3 landed in round 1 under their
# descriptive names (queries/aggregates.py pricing_summary /
# top_orders_by_revenue — the module header documents the
# equivalence). These entries make the TPC-H suite nameable as 22/22
# without a crosswalk; each delegates to the registered callable and
# reuses its oracle verbatim, so the plans (and their lint/pushdown
# tests) are shared, not duplicated.

from bigdatafinalproject_spark import registry as _registry  # noqa: E402


@query("tpch_q1_pricing_summary", oracle=_registry.ORACLES["pricing_summary"])
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — alias of ``pricing_summary``
    (queries/aggregates.py): 2-key group, 8 aggregates, date predicate
    pushed to the scan."""
    return _registry.QUERIES["pricing_summary"](spark, sf_dir)


@query(
    "tpch_q3_shipping_priority",
    oracle=_registry.ORACLES["top_orders_by_revenue"],
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) — alias of ``top_orders_by_revenue``
    (queries/aggregates.py): selective dim filter -> join -> agg ->
    top-k via TakeOrderedAndProject."""
    return _registry.QUERIES["top_orders_by_revenue"](spark, sf_dir)
