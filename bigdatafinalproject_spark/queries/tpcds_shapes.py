"""TPC-DS-shaped warehouse reports: grouping sets, deviation reports,
rank-over-rollup, channel overlap.

Net-new surface extending the warehouse story past TPC-H (the
reference's only aggregation surface is ALS-adjacent groupBys,
ALS_model3.py:134-144; basic rollup/cube/grouping-sets SQL already
lives in aggregates.py / percentiles_bands.py). The four shapes here
are the composite TPC-DS REPORT idioms a migrating user reaches for
next:

- Q27/Q36 shape: multi-level grouping sets over a 4-table star join,
  via the DataFrame-API ``groupingSets`` (Spark 4) rather than the SQL
  string surface ``grouping_sets_revenue`` exercises;
- Q89 shape: monthly actuals vs the category mean (window over an
  aggregate), reporting the months that deviate;
- Q67 shape: top-N rows per aggregation level of a ROLLUP (rank over
  grouping-sets output);
- Q38 shape: entities present in ALL channels (count-distinct
  threshold), then an exact aggregate over the survivors.

Scale notes: every query aggregates BEFORE any window/rank (the window
input is category x month / level-sized, thousands of rows at any SF);
grouping sets are one shuffle producing all levels via partial aggs;
the overlap query is a single per-customer agg + filter. Exactness
discipline: every float sum goes through the decimal-cast helpers
(functions.dsum) so window math sees bit-identical doubles on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.registry import query

_DEC = "decimal(25,6)"


@query(
    "sales_grouping_sets",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(r_name, o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
    """,
)
def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q27/Q36 shape: one pass over the fact-side star join
    produces the detail level, the per-region subtotal, and the grand
    total, each row labeled by ``grouping_id`` (same bitmask convention
    both engines: first grouping column = MSB). Exercises the Spark 4
    DataFrame-API ``groupingSets`` (the SQL-string form is covered by
    ``grouping_sets_revenue``). At 100 TB this is the one-shuffle
    alternative to three separate aggregate jobs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return (
        j.groupingSets(
            [["r_name", "o_orderpriority"], ["r_name"], []],
            "r_name",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


@query(
    "brand_monthly_deviation",
    oracle="""
    WITH monthly AS (
      SELECT p_brand,
             strftime(l_shipdate, '%Y-%m') AS sale_month,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
                 AS sales
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2),
    stats AS (
      SELECT p_brand, sale_month, sales,
             CAST(SUM(CAST(sales AS DECIMAL(25,6))) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
      FROM monthly)
    SELECT p_brand, sale_month, sales, brand_avg
    FROM stats
    WHERE sales > brand_avg * 1.15 OR sales < brand_avg * 0.85
    """,
)
def brand_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q89 shape: monthly brand sales vs the brand's mean month,
    keeping months that deviate more than 15%. The window runs over the
    AGGREGATED series (brands x months — bounded at any SF), never the
    fact table, and the window sum goes through the decimal cast so the
    mean is order-independent and bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "p_brand",
            F.date_format("l_shipdate", "yyyy-MM").alias("sale_month"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sales")
        )
    )
    w = W.partitionBy("p_brand")
    stats = monthly.withColumn(
        "brand_avg",
        F.sum(F.col("sales").cast(_DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )
    return stats.filter(
        (F.col("sales") > F.col("brand_avg") * 1.15)
        | (F.col("sales") < F.col("brand_avg") * 0.85)
    ).select("p_brand", "sale_month", "sales", "brand_avg")


@query(
    "segment_rollup_top5",
    oracle="""
    WITH agg AS (
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment_name,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             CAST(GROUPING(c_mktsegment, o_orderpriority) AS INT) AS gid,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY ROLLUP (c_mktsegment, o_orderpriority)),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY gid
               ORDER BY spend DESC, segment_name, priority) AS rk
      FROM agg)
    SELECT segment_name, priority, gid, n_orders, spend, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def segment_rollup_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape: rank WITHIN each aggregation level of a ROLLUP
    (detail rows compete with detail rows, subtotals with subtotals)
    and keep the top 5 per level. The rank's input is the rollup output
    (levels x categories, bounded), and the ordering carries full
    tie-breaks (spend, segment, priority) so row_number is total and
    partition-invariant."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    agg = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("spend"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment_name"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "spend",
        )
    )
    w = W.partitionBy("gid").orderBy(
        F.col("spend").desc(), F.col("segment_name"), F.col("priority")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "channel_overlap_customers",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             COUNT(DISTINCT o_orderpriority) AS np,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
      FROM orders GROUP BY 1)
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(CAST(spend AS DECIMAL(25,6))) AS DOUBLE) AS total_spend
    FROM pc WHERE np = 5
    """,
)
def channel_overlap_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q38 shape: customers active in ALL five priority channels
    (count-distinct threshold instead of a 5-way INTERSECT — one
    shuffle on the customer key vs five), then an exact spend total
    over the survivors. The inner spend is already decimal-summed; the
    outer re-sum goes through the same cast so the two-level float
    aggregation stays bit-identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("np"),
        dsum(F.col("o_totalprice")).alias("spend"),
    )
    return pc.filter(F.col("np") == 5).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("spend")).alias("total_spend"),
    )


@query(
    "channel_cumulative_crossover",
    oracle="""
    WITH urgent AS (
      SELECT c_mktsegment AS segment_name,
             strftime(o_orderdate, '%Y-%m') AS sale_month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2),
    low AS (
      SELECT c_mktsegment AS segment_name,
             strftime(o_orderdate, '%Y-%m') AS sale_month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE o_orderpriority = '5-LOW' GROUP BY 1, 2),
    cu AS (SELECT segment_name, sale_month,
                  CAST(SUM(CAST(rev AS DECIMAL(25,6))) OVER (
                    PARTITION BY segment_name ORDER BY sale_month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS cum_urgent
           FROM urgent),
    cl AS (SELECT segment_name, sale_month,
                  CAST(SUM(CAST(rev AS DECIMAL(25,6))) OVER (
                    PARTITION BY segment_name ORDER BY sale_month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS cum_low
           FROM low)
    SELECT COALESCE(cu.segment_name, cl.segment_name) AS segment_name,
           COALESCE(cu.sale_month, cl.sale_month) AS sale_month,
           cum_urgent, cum_low
    FROM cu FULL JOIN cl
      ON cl.segment_name = cu.segment_name AND cl.sale_month = cu.sale_month
    WHERE cum_urgent > cum_low
    """,
)
def channel_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: two channels' CUMULATIVE series (urgent vs
    low priority revenue per segment-month), full-outer-joined on the
    series key, keeping the points where one channel's running total
    leads the other. Both running sums are windows over ALREADY
    AGGREGATED series (segments x months — bounded at any SF), framed
    ROWS UNBOUNDED PRECEDING with decimal-cast sums so the cumulative
    doubles are bit-identical on both engines; the full join compares
    two bounded series, never facts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, F.col("c_custkey") == F.col("o_custkey"))

    def cum(priority: str, out: str) -> DataFrame:
        monthly = (
            j.filter(F.col("o_orderpriority") == priority)
            .groupBy(
                F.col("c_mktsegment").alias("segment_name"),
                F.date_format("o_orderdate", "yyyy-MM").alias("sale_month"),
            )
            .agg(dsum(F.col("o_totalprice")).alias("rev"))
        )
        w = (
            W.partitionBy("segment_name")
            .orderBy("sale_month")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return monthly.select(
            "segment_name",
            "sale_month",
            F.sum(F.col("rev").cast(_DEC)).over(w).cast("double").alias(out),
        )

    cu = cum("1-URGENT", "cum_urgent")
    cl = cum("5-LOW", "cum_low")
    joined = cu.alias("u").join(
        cl.alias("l"),
        (F.col("l.segment_name") == F.col("u.segment_name"))
        & (F.col("l.sale_month") == F.col("u.sale_month")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("u.segment_name"), F.col("l.segment_name")).alias(
            "segment_name"
        ),
        F.coalesce(F.col("u.sale_month"), F.col("l.sale_month")).alias(
            "sale_month"
        ),
        "cum_urgent",
        "cum_low",
    ).filter(F.col("cum_urgent") > F.col("cum_low"))


@query(
    "nation_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT n_name AS nation_name, r_name AS region_name,
             CAST(year(o_orderdate) AS INT) AS sale_year,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n_regionkey
      GROUP BY 1, 2, 3)
    SELECT y1.nation_name, y1.region_name,
           y1.sale_year AS year_base, y1.rev AS rev_base,
           y2.rev AS rev_next,
           CAST(y1.n_orders AS BIGINT) AS orders_base,
           CAST(y2.n_orders AS BIGINT) AS orders_next
    FROM yearly y1 JOIN yearly y2
      ON y2.nation_name = y1.nation_name
     AND y2.sale_year = y1.sale_year + 1
    WHERE y2.rev > y1.rev
    """,
)
def nation_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64 shape: the same star aggregated per year, then
    SELF-JOINED year-over-year to report the entities that grew. The
    multi-year comparison happens on the AGGREGATE (nations x years —
    dozens of rows at any SF, broadcastable), so the fact table is
    scanned once; the reference pattern of re-scanning facts per year
    is the anti-plan this avoids at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    yearly = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").cast("int").alias("sale_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("rev"),
        )
    )
    y1, y2 = yearly.alias("y1"), yearly.alias("y2")
    return (
        y1.join(
            y2,
            (F.col("y2.nation_name") == F.col("y1.nation_name"))
            & (F.col("y2.sale_year") == F.col("y1.sale_year") + 1),
        )
        .filter(F.col("y2.rev") > F.col("y1.rev"))
        .select(
            F.col("y1.nation_name").alias("nation_name"),
            F.col("y1.region_name").alias("region_name"),
            F.col("y1.sale_year").alias("year_base"),
            F.col("y1.rev").alias("rev_base"),
            F.col("y2.rev").alias("rev_next"),
            F.col("y1.n_orders").alias("orders_base"),
            F.col("y2.n_orders").alias("orders_next"),
        )
    )


@query(
    "brand_moving_avg_outliers",
    oracle="""
    WITH monthly AS (
      SELECT p_brand,
             strftime(l_shipdate, '%Y-%m') AS sale_month,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
                 AS sales
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2),
    ma AS (
      SELECT p_brand, sale_month, sales,
             CAST(SUM(CAST(sales AS DECIMAL(25,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS moving_avg,
             CAST(COUNT(*) OVER w AS INT) AS n_window
      FROM monthly
      WINDOW w AS (PARTITION BY p_brand ORDER BY sale_month
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)),
    dev AS (
      SELECT p_brand, sale_month, sales, moving_avg, n_window,
             abs(sales - moving_avg) / moving_avg AS deviation
      FROM ma WHERE n_window = 3)
    SELECT p_brand, sale_month, sales, moving_avg, deviation,
           CAST(row_number() OVER (PARTITION BY p_brand
                                   ORDER BY deviation DESC, sale_month) AS INT)
               AS dev_rank
    FROM dev WHERE deviation > 0.2
    """,
)
def brand_moving_avg_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape: monthly brand sales vs a CENTERED MOVING
    AVERAGE (rows 1 preceding..1 following), keeping full-window
    months that deviate >20% and ranking each brand's worst months.
    Complements brand_monthly_deviation (deviation from the brand's
    GLOBAL mean) with the frame-based seasonal variant. Both windows
    run over the aggregated series (brands x months), never facts;
    the frame sum is decimal-cast so the moving average is
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "p_brand",
            F.date_format("l_shipdate", "yyyy-MM").alias("sale_month"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sales")
        )
    )
    w = (
        W.partitionBy("p_brand")
        .orderBy("sale_month")
        .rowsBetween(-1, 1)
    )
    ma = monthly.select(
        "p_brand",
        "sale_month",
        "sales",
        (
            F.sum(F.col("sales").cast(_DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_window"),
    )
    dev = (
        ma.filter(F.col("n_window") == 3)
        .withColumn(
            "deviation",
            F.abs(F.col("sales") - F.col("moving_avg")) / F.col("moving_avg"),
        )
        .filter(F.col("deviation") > 0.2)
    )
    rw = W.partitionBy("p_brand").orderBy(
        F.col("deviation").desc(), F.col("sale_month")
    )
    return dev.select(
        "p_brand",
        "sale_month",
        "sales",
        "moving_avg",
        "deviation",
        F.row_number().over(rw).cast("int").alias("dev_rank"),
    )


@query(
    "brand_week_lag_chain",
    oracle="""
    WITH d1 AS (SELECT DISTINCT o_orderdate AS d1_d FROM orders),
    d2 AS (SELECT DISTINCT l_shipdate AS d2_d FROM lineitem),
    w AS (SELECT DISTINCT date_trunc('week', l_shipdate) AS w_start
          FROM lineitem
          WHERE year(date_trunc('week', l_shipdate)) = 1996),
    f AS (SELECT p_brand, o_orderdate, l_shipdate
          FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN part ON p_partkey = l_partkey)
    SELECT * FROM (
      SELECT p_brand,
             strftime(date_trunc('week', d1_d), '%Y-%m-%d') AS sold_week,
             COUNT(*) AS n_late
      FROM f
      JOIN d1 ON o_orderdate = d1_d
      JOIN d2 ON l_shipdate = d2_d AND d2_d > d1_d + INTERVAL 30 DAY
      JOIN w ON date_trunc('week', d2_d) = w_start
      GROUP BY 1, 2)
    ORDER BY n_late DESC, p_brand, sold_week
    LIMIT 100
    """,
)
def brand_week_lag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q72 shape (VERDICT r7 #6): one fact joined through a
    CHAIN of date dimensions with an inequality linking them — sold
    date dim, ship date dim constrained to lag the sold date by > 30
    days (the inventory-shortfall lag of the original), and a third
    filtered week dim that keeps only 1996 ship weeks. The planner
    must order three dim joins around one fact scan and propagate the
    selective week filter — the multi-dim-join-ordering stress the
    original is famous for; tests/test_dpp.py proves the same shape
    dynamic-partition-prunes a week-partitioned fact copy.

    Scale notes: all three date dims are tiny (distinct dates/weeks) —
    broadcast; the fact side is scanned once; the aggregate is
    map-side-combinable (brand x week groups). Top-100 via
    TakeOrderedAndProject, never a global sort."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    d1 = o.select(F.col("o_orderdate").alias("d1_d")).distinct()
    d2 = li.select(F.col("l_shipdate").alias("d2_d")).distinct()
    w = (
        li.select(F.date_trunc("week", "l_shipdate").alias("w_start"))
        .distinct()
        .filter(F.year("w_start") == 1996)
    )
    f = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).join(
        p, F.col("p_partkey") == F.col("l_partkey")
    )
    j = (
        f.join(F.broadcast(d1), F.col("o_orderdate") == F.col("d1_d"))
        .join(
            F.broadcast(d2),
            (F.col("l_shipdate") == F.col("d2_d"))
            & (F.col("d2_d") > F.col("d1_d") + F.expr("INTERVAL 30 DAYS")),
        )
        .join(
            F.broadcast(w),
            F.date_trunc("week", F.col("d2_d")) == F.col("w_start"),
        )
    )
    agg = j.groupBy(
        "p_brand",
        F.date_format(F.date_trunc("week", "d1_d"), "yyyy-MM-dd").alias(
            "sold_week"
        ),
    ).agg(F.count(F.lit(1)).alias("n_late"))
    return agg.orderBy(
        F.col("n_late").desc(), "p_brand", "sold_week"
    ).limit(100)


@query(
    "repeat_supplier_no_return_orders",
    oracle="""
    WITH band AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                    AND o_orderdate < TIMESTAMP '1997-01-01'),
    qualified AS (
      SELECT o_orderkey, o_totalprice FROM band b
      WHERE EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
                      ON l2.l_orderkey = l1.l_orderkey
                     AND l2.l_suppkey <> l1.l_suppkey
                    WHERE l1.l_orderkey = b.o_orderkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem lr
                        WHERE lr.l_orderkey = b.o_orderkey
                          AND lr.l_returnflag = 'R'))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               AS total_price
    FROM qualified
    """,
)
def repeat_supplier_no_return_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-DS Q95 shape (VERDICT r7 #6): a semi-join CHAIN over the
    fact relation — orders in a one-year band that (a) have lines from
    at least two distinct suppliers (EXISTS self-join of the fact on
    itself: same order, different supplier — the repeat-channel
    predicate) and (b) have no returned line (NOT EXISTS). One-row
    rollup of qualifying order count + decimal-exact total.

    Plan shape: the multi-supplier set is a fact self-join reduced to
    DISTINCT keys, then two key-only joins against the banded orders —
    leftsemi then leftanti, neither widening the row. At 100 TB the
    self-join shuffles on l_orderkey once (both sides co-partitioned)
    and the semi/anti probes carry keys only."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    band = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice")
    l1 = li.select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("s1")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    multi = (
        l1.join(
            l2,
            (F.col("k1") == F.col("k2")) & (F.col("s1") != F.col("s2")),
            "leftsemi",
        )
        .select(F.col("k1").alias("o_orderkey"))
        .distinct()
    )
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    qualified = band.join(multi, "o_orderkey", "leftsemi").join(
        returned, "o_orderkey", "leftanti"
    )
    return qualified.agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )
