"""Window-function operators (SURVEY §2.5): partitioned row_number /
rank / lag / lead, frame-spec running aggregates, top-k per group, and
batch sessionization.

The reference's only windows were row_number over rand() (W2) and one
GLOBAL unpartitioned window (W1 — the single-task anti-pattern, fixed
in ids_splits.py). Everything here partitions by a key, so each window
is a per-key task group — scales with the key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.registry import query

_DEC = "decimal(25,6)"


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (W2 shape, reference ALS_model3.py:222-225
    used it for leave-one-out). Unique tiebreak column mandatory."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_analytics",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           lag(l_quantity)  OVER seq AS prev_qty,
           lead(l_quantity) OVER seq AS next_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6)))
                OVER (seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
           seq AS (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_partkey)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/lag/lead + ROWS frame running sum (all absent in
    the reference, §2.5 'absent' row). Running sum accumulates in decimal
    so the frame evaluation order cannot perturb the double result."""
    li = load_table(spark, sf_dir, "lineitem")
    # The synthetic lineitem carries duplicate (orderkey, linenumber)
    # pairs, so the sequence order extends to every column the outputs
    # read — remaining ties are value-identical, making lag/lead/running
    # deterministic without a unique key.
    seq = W.partitionBy("l_suppkey").orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey"
    )
    rnk_w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.rank().over(rnk_w).alias("rnk"),
        F.dense_rank().over(rnk_w).alias("drnk"),
        F.lag("l_quantity").over(seq).alias("prev_qty"),
        F.lead("l_quantity").over(seq).alias("next_qty"),
        F.sum(F.col("l_quantity").cast(_DEC))
        .over(seq.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_qty"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           CAST(ntile(4) OVER seq AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM lineitem
    WINDOW seq AS (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber, l_quantity,
                            l_extendedprice, l_partkey),
           w AS (PARTITION BY l_suppkey ORDER BY l_quantity)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist
    — §2.5 'absent' row). percent_rank and cume_dist are single double
    divisions over exact integer ranks, so they compare bit-for-bit;
    ntile rides the fully-extended deterministic ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    seq = W.partitionBy("l_suppkey").orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey"
    )
    qty_w = W.partitionBy("l_suppkey").orderBy("l_quantity")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.ntile(4).over(seq).alias("quartile"),
        F.percent_rank().over(qty_w).alias("pct_rank"),
        F.cume_dist().over(qty_w).alias("cdist"),
    )


@query(
    "sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id)) > 1800
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events),
    sessions AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS INT) AS session_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min-gap sessions via lag + running sum of
    session starts (the classic gaps-and-islands plan; the streaming
    equivalent is session_window in streaming/events.py)."""
    e = load_table(spark, sf_dir, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(seq).cast("long")
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id",
            F.sum("is_new")
            .over(seq.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("int")
            .alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "events_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER seq IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER seq)
                          >= 1800000000
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events
      WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM marked)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 1800 SECONDS,
                    '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE batch ``session_window`` (the declarative twin of the
    gaps-and-islands ``sessionize`` above): one groupBy whose grouping
    key is the merged 30-min-gap session interval — Spark plans it as
    a single partial/final session aggregation (map-side session
    merging), no window function and no second shuffle, which is the
    shape you want when sessions, not raw events, are the output.

    Boundary rule pinned by the oracle: windows are half-open
    [ts, ts+gap), so a successor exactly gap seconds later starts a
    NEW session (the >= in the oracle's microsecond-exact gap test);
    session_end is last-event time + gap, exactly session_window's
    ``end`` field.
    """
    from bigdatafinalproject_spark.functions import dsum

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )
