"""Aggregation operators (SURVEY §2.4, §2.6): hash aggs, multi-aggs,
HAVING, pivot, rollup, summary statistics, top-k, distinct counts.

All float sums/avgs go through the decimal trick (functions.dsum/davg)
so partial+final aggregation order cannot change the result — which is
both the cross-engine-determinism story and the 100 TB story (the same
plan property that makes map-side combine safe makes the oracle match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import davg, dsum
from bigdatafinalproject_spark.registry import query

_DEC = "decimal(25,6)"


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_quantity)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_extendedprice)
               AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_discount)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2-key group, 8 aggregates, date predicate pushed to
    the scan. The canonical partial+final hash-agg benchmark query."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax, qty = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_quantity"),
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty).alias("sum_qty"),
            dsum(price).alias("sum_base_price"),
            dsum(price * (1 - disc)).alias("sum_disc_price"),
            dsum(price * (1 - disc) * (1 + tax)).alias("sum_charge"),
            davg(qty).alias("avg_qty"),
            davg(price).alias("avg_price"),
            davg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k
    (TakeOrderedAndProject, never a global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "summary_stats",
    oracle=f"""
    SELECT 'l_quantity' AS col,
           COUNT(l_quantity) AS n,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(l_quantity) AS mean_v,
           sqrt(greatest(
             (CAST(SUM(CAST(l_quantity * l_quantity AS {_DEC})) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE)
                * CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(l_quantity))
             / (COUNT(l_quantity) - 1), 0.0)) AS std_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount' AS col,
           COUNT(l_discount) AS n,
           CAST(MIN(l_discount) AS DOUBLE) AS min_v,
           CAST(MAX(l_discount) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE) / COUNT(l_discount) AS mean_v,
           sqrt(greatest(
             (CAST(SUM(CAST(l_discount * l_discount AS {_DEC})) AS DOUBLE)
              - CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE)
                * CAST(SUM(CAST(l_discount AS {_DEC})) AS DOUBLE) / COUNT(l_discount))
             / (COUNT(l_discount) - 1), 0.0)) AS std_v
    FROM lineitem
    """,
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()/summary() semantics (A4, reference example.py:79) made
    engine-portable: stddev via the sum-of-squares identity over decimal
    sums (plain stddev_samp is float-association-order dependent)."""
    li = load_table(spark, sf_dir, "lineitem")

    def stats(colname: str) -> DataFrame:
        x = F.col(colname)
        n = F.count(x)
        sx = F.sum(x.cast(_DEC)).cast("double")
        sxx = F.sum((x * x).cast(_DEC)).cast("double")
        return li.agg(
            F.lit(colname).alias("col"),
            n.alias("n"),
            F.min(x).cast("double").alias("min_v"),
            F.max(x).cast("double").alias("max_v"),
            (sx / n).alias("mean_v"),
            F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))).alias("std_v"),
        )

    return stats("l_quantity").unionByName(stats("l_discount"))


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(25,6)))
                AS DOUBLE) AS O,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(25,6)))
                AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot aggregation (A3, reference similarity_matrix.py:37-38) with an
    EXPLICIT value list — at scale, never let Spark scan for pivot values
    (the reference needed pivotMaxValues=5M; we treat wide pivots as an
    anti-pattern and keep pivot for low-cardinality columns only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"))
    )


@query(
    "rollup_revenue",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal,
           COUNT(*) AS n
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in the reference, §2.4 'absent' row)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(dsum(F.col("s_acctbal")).alias("total_bal"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "total_bal",
            "n",
        )
    )


@query(
    "distinct_counts",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_suppkey)  AS n_supps
    FROM lineitem
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global + distinct counts (A5; reference counted with separate
    .count() actions per metric, ALS_model3.py:134-144 — here one job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "corr_covar_portable",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS sx,
             SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sy,
             SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
                 * CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS sxx,
             SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                 * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS syy,
             SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
                 * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sxy
      FROM lineitem),
    d AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS d1,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS d2
      FROM m)
    SELECT n,
           num / (10000.0 * n * (n - 1)) AS covar_qty_price,
           num / (sqrt(d1) * sqrt(d2)) AS corr_qty_price
    FROM d
    """,
)
def corr_covar_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance, engine- and
    partition-exact at ANY scale (built-in corr()/covar_samp() stream
    doubles, so their result depends on partitioning).

    The raw moments accumulate as exact integers in cent units (both
    columns carry <= 2 decimal digits), and — critically — the
    catastrophic cancellation n*Sxy - Sx*Sy happens IN integer
    arithmetic, not doubles: converting the big moments to double first
    leaves each engine's decimal/int128->double rounding (1 ulp apart)
    amplified thousands of times by the subtraction, which is exactly
    what a first version of this query got wrong at sf0.1. Only the
    already-small differences cross to double, via a STRING cast
    (correctly-rounded parse in both engines); the closing expressions
    are then an identical IEEE op sequence. Magnitudes: n*Sxy fits
    int128/DECIMAL(38) beyond sf 1000. One shuffle (global
    partial+final agg) regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    i18 = "decimal(18,0)"
    x = (F.col("l_quantity") * 100).cast(i18)
    y = (F.col("l_extendedprice") * 100).cast(i18)
    m = li.agg(
        F.count(F.lit(1)).cast(i18).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("string").cast("double")
    d1 = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("string").cast("double")
    d2 = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("string").cast("double")
    nd = n.cast("double")
    return m.select(
        n.cast("long").alias("n"),
        (num / (F.lit(10000.0) * nd * (nd - F.lit(1.0)))).alias("covar_qty_price"),
        (num / (F.sqrt(d1) * F.sqrt(d2))).alias("corr_qty_price"),
    )
