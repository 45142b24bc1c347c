"""Product-analytics queries over the events table: ordered funnel
conversion and cohort retention. Net-new surface (the reference has no
event-time analytics, SURVEY §2.10) — the aggregate shapes every
analytics engine is asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.registry import query


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
    SELECT s1.user_id,
           strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS first_view,
           strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS first_click_after,
           strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS first_purchase_after,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage_reached
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): each stage is the
    MIN event time strictly after the previous stage's time, so
    out-of-order events never count. Three conditional aggregations
    joined on user_id; the per-stage frames are one row per user —
    broadcastable, the events scan is the only big input each pass."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    out = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return out.select(
        "user_id",
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("first_view"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("first_click_after"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("first_purchase_after"),
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
        .cast("int")
        .alias("stage_reached"),
    )


@query(
    "events_gap_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           quantile_cont(gap, 0.5) AS p50_us,
           quantile_cont(gap, 0.9) AS p90_us,
           quantile_cont(gap, 0.99) AS p99_us
    FROM g WHERE gap IS NOT NULL GROUP BY 1
    """,
)
def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time distribution: per-user gaps in exact
    epoch-microseconds (lag over an integer ordering — engine-identical
    ties), summarized per event_type with exact percentiles (integer
    inputs, one interpolation divide — bit-portable per the
    exact_percentiles precedent)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.expr("percentile(gap, 0.5)").alias("p50_us"),
        F.expr("percentile(gap, 0.9)").alias("p90_us"),
        F.expr("percentile(gap, 0.99)").alias("p99_us"),
    )


@query(
    "events_moving_median",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           v,
           quantile_cont(v, 0.5) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS smoothed
    FROM hourly
    """,
)
def events_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-median smoothing of the hourly series: a centered 3-bucket
    median per event_type — robust to single-bucket spikes where a
    moving average is not. The 3-element median picks the middle value
    (or one interpolation divide at the series edges), so it is exactly
    portable; inputs are the decimal-exact hourly sums."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(dsum(F.col("value")).alias("v"))
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-1, 1)
    )
    return hourly.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "v",
        F.expr("percentile(v, 0.5)").over(w).alias("smoothed"),
    )


@query(
    "events_count_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT event_type, bucket, n,
             quantile_cont(n, 0.5) OVER (
                 PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS med
      FROM hourly)
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n, med,
           CAST(CASE WHEN med IS NOT NULL AND n > 2.0 * med
                THEN 1 ELSE 0 END AS INT) AS anomaly
    FROM w
    """,
)
def events_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type compared
    to the trailing 6-bucket median (ROWS frame strictly before the
    current bucket — no self-inclusion); a bucket at more than 2x its
    trailing median flags. Counts are exact integers, the median is at
    worst one interpolation divide — fully portable."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("bucket").rowsBetween(-6, -1)
    med = F.expr("percentile(n, 0.5)").over(w)
    return hourly.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        med.alias("med"),
        (med.isNotNull() & (F.col("n") > F.lit(2.0) * med))
        .cast("int")
        .alias("anomaly"),
    )


@query(
    "customer_rfm",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    per AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            CAST(maxd AS DATE)) AS INT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS monetary
      FROM orders, mx GROUP BY o_custkey, maxd),
    cuts AS (
      SELECT quantile_cont(recency_days, 0.2) AS r1,
             quantile_cont(recency_days, 0.4) AS r2,
             quantile_cont(recency_days, 0.6) AS r3,
             quantile_cont(recency_days, 0.8) AS r4,
             quantile_cont(frequency, 0.2) AS f1,
             quantile_cont(frequency, 0.4) AS f2,
             quantile_cont(frequency, 0.6) AS f3,
             quantile_cont(frequency, 0.8) AS f4,
             quantile_cont(monetary, 0.2) AS m1,
             quantile_cont(monetary, 0.4) AS m2,
             quantile_cont(monetary, 0.6) AS m3,
             quantile_cont(monetary, 0.8) AS m4
      FROM per)
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(1 + CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
                  + CAST(recency_days > r3 AS INT) + CAST(recency_days > r4 AS INT)
                AS INT) AS r,
           CAST(1 + CAST(frequency < f4 AS INT) + CAST(frequency < f3 AS INT)
                  + CAST(frequency < f2 AS INT) + CAST(frequency < f1 AS INT)
                AS INT) AS f,
           CAST(1 + CAST(monetary < m4 AS INT) + CAST(monetary < m3 AS INT)
                  + CAST(monetary < m2 AS INT) + CAST(monetary < m1 AS INT)
                AS INT) AS m
    FROM per, cuts
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order, anchored to
    the dataset max date), frequency, and decimal-exact monetary value
    per customer, banded 1-5 by broadcast quintile cut values (best
    band 1 = most recent / most frequent / highest spend; value ties
    share a band).

    The r1 version ran three unpartitioned ntile windows over ALL
    customers — a single task at scale (SURVEY §4.3-1). Here the cut
    values are a 12-number aggregate broadcast back, and band
    assignment is a per-row comparison: one extra reduction, zero
    global sorts. ``percentile`` is exact (bit-matches DuckDB
    quantile_cont — see exact_percentiles); at 100 TB swap in
    approx_percentile, same shape."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    per = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice")).alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.to_date("maxd"), F.to_date("lastd"))
            .cast("int")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    cuts = per.agg(
        *[
            F.expr(f"percentile({c}, {p})").alias(f"{a}{i}")
            for c, a in (("recency_days", "r"), ("frequency", "f"), ("monetary", "m"))
            for i, p in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]
    )

    def asc_band(val: str, pre: str):
        b = F.lit(1)
        for i in (1, 2, 3, 4):
            b = b + (F.col(val) > F.col(f"{pre}{i}")).cast("int")
        return b.cast("int")

    def desc_band(val: str, pre: str):
        b = F.lit(1)
        for i in (4, 3, 2, 1):
            b = b + (F.col(val) < F.col(f"{pre}{i}")).cast("int")
        return b.cast("int")

    return per.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        asc_band("recency_days", "r").alias("r"),
        desc_band("frequency", "f").alias("f"),
        desc_band("monetary", "m").alias("m"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events),
    c2 AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    c1 AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS n_cur FROM c2 GROUP BY 1)
    SELECT c2.cur, c2.nxt, c2.n, c1.n_cur,
           CAST(c2.n AS DOUBLE) / c1.n_cur AS p
    FROM c2 JOIN c1 USING (cur)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next | current) from exact transition counts (lead
    over an integer epoch-microsecond ordering — engine-identical
    ties). The context total reuses the transition aggregate, no second
    scan; output is event-type-squared rows, bounded regardless of
    table size."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c2 = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    c1 = c2.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (
        c2.join(c1, "cur")
        .withColumn("p", F.col("n").cast("double") / F.col("n_cur"))
        .select("cur", "nxt", "n", "n_cur", "p")
    )


@query(
    "part_degree_distribution",
    oracle="""
    WITH deg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS d
                 FROM lineitem GROUP BY 1)
    SELECT CAST(length(bin(d)) AS INT) AS log2_bin,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           MIN(d) AS min_degree,
           MAX(d) AS max_degree
    FROM deg GROUP BY 1
    """,
)
def part_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the order-part bipartite graph in
    power-of-two bins — THE skew diagnostic before choosing join/agg
    strategies (SURVEY §7.8-3). Bins come from the binary-string length
    of the degree (exact floor(log2)+1 — never float log2, whose
    rounding at powers of two differs across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    deg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("d"))
    return deg.groupBy(
        F.length(F.bin("d")).cast("int").alias("log2_bin")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("d").alias("min_degree"),
        F.max("d").alias("max_degree"),
    )


@query(
    "events_retention",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    coh AS (SELECT user_id, MIN(d) AS c FROM act GROUP BY 1)
    SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c, d) AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act JOIN coh USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted per
    day offset. The (user, day) activity set is distinct-reduced first
    (combinable), cohorts are one row per user (broadcast), and the
    final count per (cohort, offset) needs no distinct — (user, day)
    is already unique."""
    e = load_table(spark, sf_dir, "events")
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    coh = act.groupBy("user_id").agg(F.min("d").alias("c"))
    return (
        act.join(F.broadcast(coh), "user_id")
        .groupBy(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "c").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
