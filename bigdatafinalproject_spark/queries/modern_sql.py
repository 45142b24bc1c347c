"""Spark 4 SQL-surface operators: recursive CTEs, SQL UDFs, VARIANT.

Net-new capability (absent from the reference, which has no SQL entry
point beyond sqlite passthrough — SURVEY §2.1 S7): the three Spark 4
additions a warehouse user reaches for first, each with an exact DuckDB
oracle.

- Recursive CTE (``WITH RECURSIVE``): hierarchy walks / transitive
  closure without driver-side loops. Spark executes it as an iterative
  union under AQE; depth here is bounded by construction (log10 of the
  key domain), so the plan is a handful of joins at any data size.
- SQL UDF (``CREATE FUNCTION ... RETURN expr``): named reusable
  expressions that inline into the plan at analysis time — unlike
  Python UDFs they stay inside whole-stage codegen (no serialization
  boundary), so they are the 100 TB-safe way to share logic.
- VARIANT (``parse_json`` + ``variant_get``): the typed open-schema
  path for semi-structured columns — binary-encoded once, then typed
  extraction without re-parsing the JSON text per access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table, register_views
from bigdatafinalproject_spark.registry import query
from bigdatafinalproject_spark.sources.pydatasource import (
    _A as _A_ORACLE,
    _B as _B_ORACLE,
    _M as _M_ORACLE,
)


@query(
    "customer_hierarchy_closure",
    oracle="""
    WITH RECURSIVE walk(ck, cur, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT ck, cur // 10, depth + 1 FROM walk WHERE cur >= 10
    )
    SELECT depth,
           COUNT(*) AS n_customers,
           CAST(SUM(cur) AS BIGINT) AS root_sum
    FROM walk WHERE cur < 10
    GROUP BY depth
    """,
)
def customer_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy walk: every customer climbs a synthetic
    parent chain (parent = custkey div 10 — a deterministic 10-ary
    tree) to its single-digit root; output is per-depth customer counts
    and the exact integer sum of reached roots.

    The recursion depth is log10(max custkey) — 6 levels at SF100 —
    so the iterative plan stays shallow no matter the row count; each
    level is one filter+project over the frontier, no driver loop
    (the reference's only hierarchy-ish logic was Python iteration,
    recommendations3.py:120-151).
    """
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH RECURSIVE walk(ck, cur, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer
          UNION ALL
          SELECT ck, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
        )
        SELECT depth,
               COUNT(*) AS n_customers,
               CAST(SUM(cur) AS BIGINT) AS root_sum
        FROM walk WHERE cur < 10
        GROUP BY depth
        """
    )


@query(
    "sql_udf_price_bands",
    oracle="""
    SELECT CASE WHEN p_retailprice < 930 THEN 'low'
                WHEN p_retailprice < 970 THEN 'mid'
                ELSE 'high' END AS band,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_size AS BIGINT) * 3 + 1) AS BIGINT) AS size_score
    FROM part GROUP BY 1
    """,
)
def sql_udf_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDFs (CREATE FUNCTION ... RETURN <expr>, Spark 4): a string
    banding function and an integer scoring function, both defined as
    named SQL functions and used in one aggregation.

    SQL UDFs inline into the logical plan at analysis time — the
    physical plan is identical to hand-written expressions (still one
    WholeStageCodegen span, zero Python boundary), which is exactly why
    they are preferred over Python UDFs for shared logic at scale. The
    oracle states the inlined expressions directly.
    """
    register_views(spark, sf_dir, ["part"])
    # param typed DOUBLE to match the column exactly — a decimal param
    # would round at the implicit cast and diverge from the oracle's
    # raw-double comparisons
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bdfp_price_band(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p < 930 THEN 'low' "
        "WHEN p < 970 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bdfp_size_score(s INT) "
        "RETURNS BIGINT RETURN CAST(s AS BIGINT) * 3 + 1"
    )
    return spark.sql(
        """
        SELECT bdfp_price_band(p_retailprice) AS band,
               COUNT(*) AS n_parts,
               CAST(SUM(bdfp_size_score(p_size)) AS BIGINT) AS size_score
        FROM part GROUP BY 1
        """
    )


@query(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS INT) // 25 AS INT)
               AS k_quartile,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_no_extra
    FROM events
    GROUP BY 1, 2
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access (Spark 4): ``parse_json``
    encodes the props payload once into the binary Variant form, then
    ``variant_get`` does TYPED extraction ($.k as int) and
    ``try_variant_get`` probes a path that does not exist (open-schema
    tolerance — returns null, never throws).

    vs events_json_props (string get_json_object): Variant parses the
    JSON text once per row and serves every subsequent path from the
    binary encoding — the difference between O(paths) text parses and
    one, which is the scale story for wide semi-structured columns.
    """
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    extra = F.try_variant_get(v, "$.missing", "string")
    return (
        e.select(
            "event_type",
            # integer DIV (k is non-negative) — matches the oracle's //
            F.expr(
                "CAST(try_variant_get(parse_json(props), '$.k', 'int') "
                "DIV 25 AS INT)"
            ).alias("k_quartile"),
            F.when(extra.isNull(), 1).otherwise(0).alias("_no_extra"),
        )
        .groupBy("event_type", "k_quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_no_extra").cast("long").alias("n_no_extra"),
        )
    )


@query(
    "nation_rich_listagg",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rich,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_acctbal >= 9000
    GROUP BY c_nationkey
    """,
)
def nation_rich_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — ``listagg(...) WITHIN GROUP (ORDER
    BY ...)`` (SQL:2016, new in Spark 4): the deterministic form of
    collect_list+concat for building per-group label strings. The
    WITHIN GROUP ordering is the whole point at scale: shuffle arrival
    order is nondeterministic, so an unordered listagg would produce a
    different string every run — ordered, it is one map-side-combinable
    aggregation with stable output. Filter keeps groups small (an
    unbounded listagg is a memory smell at 100 TB — cap or pre-rank
    the group first)."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n_rich,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer WHERE c_acctbal >= 9000
        GROUP BY c_nationkey
        """
    )


@query(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON TRUE
    WHERE c.c_nationkey % 5 = 2
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-row ORDER BY + LIMIT (the
    SQL-standard "top-N per group" spelling). Catalyst decorrelates the
    correlated LIMIT into a partitioned window over one equi-join — no
    per-customer re-execution and no nested loop, so the plan is the
    same shuffle-once shape as the hand-written row_number()<=2 form
    (queries/windows.topk_per_group) and scales identically. The query
    proves the decorrelation path, the windows.py twin the manual one."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_nationkey % 5 = 2
        """
    )


@query(
    "python_datasource_agg",
    oracle=f"""
    SELECT CAST(i % 7 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(({_A_ORACLE} * i + {_B_ORACLE}) % {_M_ORACLE}) AS BIGINT)
               AS value_sum
    FROM range(0, 5000) t(i)
    GROUP BY 1
    """,
)
def python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 DataSource API,
    sources/pydatasource.py): a deterministic series source registered
    as format ``bdfp_series``, read with 8 declared input partitions
    (parallel scheduling, no single-task funnel), aggregated on top.

    The oracle replays the generator arithmetic over ``range(0, n)`` —
    an exact correctness row for a from-scratch connector's
    partitioning + read path.
    """
    from bigdatafinalproject_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("bdfp_series")
        .option("n", 5000)
        .option("parts", 8)
        .load()
    )
    return (
        df.groupBy((F.col("id") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").cast("long").alias("value_sum"),
        )
    )
