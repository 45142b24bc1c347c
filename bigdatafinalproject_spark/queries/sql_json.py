"""SQL entry point, JSON functions, date/time functions, cube, and
approximate aggregates (SURVEY §2.8 scalar families + §3.4 SQL surface
+ §2.4 'absent' rows made present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table, register_views
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.registry import query


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (semi-structured payloads —
    get_json_object stays JVM-side, no UDF)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "sql_surface_revenue",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_surface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point (S7 parity — the reference dropped to
    raw sqlite3 for ad-hoc SQL, sample_users.py:21-29; here SQL strings
    and DataFrame chains share one Catalyst path over registered
    views)."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "sql_param_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey IN (5, 17, 42, 99) AND c_acctbal >= 0.0
    ORDER BY c_custkey
    """,
)
def sql_param_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (S7 parity — the reference's only parameterized
    query was sqlite3 with ?-placeholders, sample_users.py:21-29:
    SELECT ... WHERE [User-ID] IN (...) ORDER BY [User-ID]). Spark's
    named-parameter binding (spark.sql(sql, args=...)) keeps values out
    of the SQL text — no injection surface, plan-cacheable — and the
    IN-list predicate still pushes down to the parquet scan."""
    register_views(spark, sf_dir, names=("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE c_custkey IN (:k1, :k2, :k3, :k4) AND c_acctbal >= :min_bal
        ORDER BY c_custkey
        """,
        args={"k1": 5, "k2": 17, "k3": 42, "k4": 99, "min_bal": 0.0},
    )


@query(
    "date_functions",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since_95,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family (absent in the reference, §2.8): extract,
    format, datediff — grouped to keep the result compact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
            .cast("int")
            .alias("days_since_95"),
        )
        .groupBy("ym", "y", "m", "d", "days_since_95")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cube_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (absent in the reference, §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice")).alias("revenue"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "revenue",
            "n",
        )
    )


@query("approx_stats")
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (approx_count_distinct / percentile_approx —
    HLL and KLL-style sketches differ across engines by construction,
    so this is rows-only; the exact twins are distinct_counts and
    summary_stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_quantity", 0.5).alias("p50_qty"),
        # scalar p25/p75 (not one array column): the driver harness
        # canonicalizes rows via pandas sort and dies on array cells
        F.percentile_approx("l_extendedprice", 0.25).alias("p25_price"),
        F.percentile_approx("l_extendedprice", 0.75).alias("p75_price"),
    )


@query("customer_hll_distinct")
def customer_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL,
    Spark 4 hll_sketch_agg/hll_union_agg): per-nation customer sketches
    plus the GLOBAL estimate obtained by union-merging the per-nation
    sketches — never rescanning the data. This is the 100 TB pattern
    approx_count_distinct can't express: precompute sketches per
    partition/day once, answer any rollup by merging kilobyte sketches.
    Rows-only driver check (DuckDB's HLL is a different implementation);
    the estimate-vs-exact error bound is pinned by
    tests/test_functions.py::test_hll_union_estimate_bound."""
    c = load_table(spark, sf_dir, "customer")
    sk = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(12)).alias("sk"),
        F.countDistinct("c_custkey").alias("n_exact"),
    )
    per = sk.select(
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "n_exact",
        F.hll_sketch_estimate("sk").alias("n_est"),
    )
    glob = sk.agg(
        F.sum("n_exact").alias("n_exact"),  # nation-disjoint keys: sum = global distinct
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est"),
    ).select(F.lit(-1).alias("c_nationkey"), "n_exact", "n_est")
    return per.unionByName(glob)


_ABOVE_AVG_SQL = """
    SELECT o.o_orderkey, o.o_custkey, CAST(o.o_totalprice AS DOUBLE) AS totalprice
    FROM orders o
    WHERE o.o_totalprice >
          (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                  / COUNT(*)
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@query("orders_above_customer_avg", oracle=_ABOVE_AVG_SQL)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface: orders priced
    above their customer's average. Catalyst DECORRELATES this
    (RewriteCorrelatedScalarSubquery) into a per-customer aggregate +
    equi-join — one shuffle, no nested loop (asserted in
    tests/test_plans.py) — so the 100 TB plan is the same as the
    hand-written groupBy+join. The per-customer average accumulates as
    DECIMAL so the subquery value is bit-identical across engines; the
    oracle runs the IDENTICAL SQL text."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(_ABOVE_AVG_SQL)
