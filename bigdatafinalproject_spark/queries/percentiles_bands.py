"""Exact percentiles, GROUPING SETS, deterministic sampling, and a
non-equi band join — SURVEY §2.4's "absent" aggregate rows and §2.3's
"absent" theta-join row made present — plus the audio leg of the
multimodal surface.

Scale notes baked into each query's shape:
- percentiles: ``percentile`` is a full-sort-per-group aggregate; at
  100 TB prefer ``approx_percentile`` (see sql_json.approx_stats) —
  the exact form is here because the oracle can verify it bit-for-bit.
- band join: the bands side is O(10) rows — broadcast, so the big side
  never shuffles (BroadcastNestedLoopJoin on the range predicate).
- sampling: hash-of-key Bernoulli, not ``TABLESAMPLE``/``rand()`` —
  reproducible across runs, engines, AND partitionings (fixes the
  reference's rand-reproducibility hazard, SURVEY §4.3-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table, register_views
from bigdatafinalproject_spark.functions import bucket, dsum, oracle_bucket
from bigdatafinalproject_spark.operators.multimodal import (
    extract_audio_features,
    with_binary_payload,
)
from bigdatafinalproject_spark.registry import query


@query(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(l_quantity, 0.25) AS qty_p25,
           quantile_cont(l_quantity, 0.5)  AS qty_p50,
           quantile_cont(l_quantity, 0.75) AS qty_p75,
           quantile_cont(l_extendedprice, 0.5) AS price_median
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (absent in the
    reference; its only distribution summary was describe(),
    example.py:79). Both engines use the (n-1)*p linear-interpolation
    definition, so doubles match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, 0.25)").alias("qty_p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("qty_p75"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("price_median"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (cube/rollup cousins live in sql_json /
    aggregates): one shuffle produces all three aggregation levels —
    at scale this beats unioning three separate groupBys because the
    scan and the partial aggregation are shared."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@query(
    "portable_sample",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders
    WHERE {oracle_bucket('o_orderkey', 100, seed=7)} < 10
    GROUP BY o_orderstatus
    """,
)
def portable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample by key hash. Unlike
    ``df.sample()``/TABLESAMPLE (partition-layout-dependent), the
    hash-of-key predicate is stable across engines and re-runs and
    pushes down to the scan like any other filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(bucket("o_orderkey", k=100, seed=7) < 10)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


_BANDS = [
    ("00_low", 0.0, 50_000.0),
    ("01_mid", 50_000.0, 150_000.0),
    ("02_high", 150_000.0, 300_000.0),
    ("03_lux", 300_000.0, 1e12),
]


@query(
    "price_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('00_low', 0.0, 50000.0),
        ('01_mid', 50000.0, 150000.0),
        ('02_high', 150000.0, 300000.0),
        ('03_lux', 300000.0, 1e12))
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) band join — absent from the reference
    (§2.3 'absent' row). The bands dim is O(10) rows so it is
    broadcast: the fact side streams through a BroadcastNestedLoopJoin
    with zero shuffle, which is the only plan shape that survives this
    predicate at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "doc_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(([8000,16000,22050,44100])[(('0x' || substr(md5(text), 1, 4))::INT % 4) + 1]
                AS INT) AS sample_rate,
           CAST(octet_length(encode(text)) * 4 AS BIGINT) AS n_samples,
           CAST(octet_length(encode(text)) * 4 AS DOUBLE)
             / ([8000,16000,22050,44100])[(('0x' || substr(md5(text), 1, 4))::INT % 4) + 1]
             AS duration_sec,
           (('0x' || substr(md5(text), 5, 4))::INT % 1000) / 1000.0 AS rms
    FROM documents
    """,
)
def doc_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode/feature-extract over a binary column via
    mapInPandas (operators/multimodal.extract_audio_features). Decode
    is a deterministic md5 stand-in — the container ships no audio
    codec — but schema/batching/partitioning are production-real."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    return extract_audio_features(docs, id_col="doc_id", payload_col="payload")


@query(
    "orders_upsert_latest",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             CAST(1 AS INT) AS version
      FROM orders),
    updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, CAST(2 AS INT) AS version
      FROM orders WHERE {oracle_bucket('o_orderkey', 100, seed=11)} < 10),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                       ORDER BY version DESC, o_orderstatus) AS rn
          FROM allr)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, version
    FROM r WHERE rn = 1
    """,
)
def orders_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert (operators/merge.upsert_latest): a simulated
    update batch (~10% of keys by portable hash, repriced, status 'U')
    applied over the base table; per key the newest version wins. One
    shuffle on the key — the plan MERGE INTO lowers to for full-row
    upserts, with no table-format dependency."""
    from bigdatafinalproject_spark.operators.merge import upsert_latest

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(1))
    updates = (
        o.filter(bucket("o_orderkey", k=100, seed=11) < 10)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("version", F.lit(2))
    )
    return upsert_latest(
        base, updates, keys=["o_orderkey"], version_col="version",
        tiebreak=["o_orderstatus"],
    )


_DRIFT_SPLIT = "1998-01-01"
_DRIFT_QS = "0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9"
_DRIFT_QSCALE = 10**12


def _drift_stats(counts: DataFrame, key_col: str) -> DataFrame:
    """Shared drift-statistics tail (orders_price_drift /
    events_type_drift): per-key (n_a, n_b) counts → population shares
    → abs shift + chi-square terms (NULL when the reference share is
    0 — a new-category signal, never a divide-by-zero) → int64
    floor-quantized order-independent total broadcast back onto the
    key rows. One place to fix the quantization for both queries and
    both engines' semantics."""
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    t = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            key_col,
            "n_a",
            "n_b",
            (F.col("n_a").cast("double") / F.col("ta")).alias("share_a"),
            (F.col("n_b").cast("double") / F.col("tb")).alias("share_b"),
        )
        .withColumn("abs_shift", F.abs(F.col("share_b") - F.col("share_a")))
        .withColumn(
            "chi2_term",
            F.when(
                F.col("share_a") > 0,
                (F.col("share_b") - F.col("share_a"))
                * (F.col("share_b") - F.col("share_a"))
                / F.col("share_a"),
            ),
        )
    )
    total_q = t.filter(F.col("chi2_term").isNotNull()).agg(
        F.sum(
            F.floor(F.col("chi2_term") * _DRIFT_QSCALE).cast("long")
        ).alias("chi2_total_q")
    )
    return t.crossJoin(F.broadcast(total_q)).select(
        key_col,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "share_a",
        "share_b",
        "abs_shift",
        "chi2_term",
        "chi2_total_q",
    )


@query(
    "orders_price_drift",
    oracle=f"""
    WITH e AS (SELECT quantile_cont(o_totalprice, [{_DRIFT_QS}]) AS edges
               FROM orders
               WHERE o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}'),
    binned AS (SELECT CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}'
                           THEN 1 ELSE 0 END AS in_a,
                      1 + len(list_filter((SELECT edges FROM e),
                                          x -> o_totalprice > x)) AS bin
               FROM orders),
    counts AS (SELECT bin,
                      SUM(in_a) AS n_a,
                      SUM(1 - in_a) AS n_b
               FROM binned GROUP BY bin),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    s AS (SELECT bin, n_a, n_b,
                 CAST(n_a AS DOUBLE) / (SELECT ta FROM tot) AS share_a,
                 CAST(n_b AS DOUBLE) / (SELECT tb FROM tot) AS share_b
          FROM counts),
    t AS (SELECT bin, n_a, n_b, share_a, share_b,
                 abs(share_b - share_a) AS abs_shift,
                 CASE WHEN share_a > 0
                      THEN (share_b - share_a) * (share_b - share_a) / share_a
                      ELSE NULL END AS chi2_term
          FROM s)
    SELECT CAST(bin AS INT) AS bin,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           share_a, share_b, abs_shift, chi2_term,
           (SELECT CAST(SUM(CAST(floor(chi2_term * {_DRIFT_QSCALE})
                                 AS BIGINT)) AS BIGINT)
            FROM t WHERE chi2_term IS NOT NULL) AS chi2_total_q
    FROM t
    """,
)
def orders_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection between two time periods (the
    data-quality monitor an ML pipeline runs before retraining): bin
    edges = EXACT deciles of the reference period (one ``percentile``
    aggregate — no global sort window; swap approx_percentile at
    100 TB, the documented exact_percentiles trade), both periods
    binned by one broadcast 9-edge row (ties at an edge go to the
    lower bin in both engines), per-bin population shares compared.

    Drift statistic: per-bin chi-square terms (share_b − share_a)² /
    share_a — chosen over PSI because it needs only +,−,×,÷, which
    are IEEE-correctly-rounded and therefore bit-identical across
    engines, where ln() carries last-ulp libm risk. The 10-term total
    is FLOOR-QUANTIZED to int64 before summing (the mmr/ADC
    discipline) so the cross-engine sum is order-independent exact
    integer arithmetic. Scale shape: two aggregates over the fact
    table + arithmetic on 10 rows; the 1-row totals broadcast back."""
    o = load_table(spark, sf_dir, "orders")
    in_a = (
        (F.col("o_orderdate") < F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .cast("int")
        .alias("in_a")
    )
    edges = o.filter(
        F.col("o_orderdate") < F.lit(_DRIFT_SPLIT).cast("timestamp")
    ).agg(
        F.expr(f"percentile(o_totalprice, array({_DRIFT_QS}))").alias("edges")
    )
    binned = (
        o.select(in_a, "o_totalprice")
        .crossJoin(F.broadcast(edges))
        .select(
            "in_a",
            F.expr(
                "1 + aggregate(edges, 0, (acc, e) -> "
                "acc + (CASE WHEN o_totalprice > e THEN 1 ELSE 0 END))"
            ).alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.sum("in_a").alias("n_a"),
        F.sum(1 - F.col("in_a")).alias("n_b"),
    )
    # shared tail: on this corpus every bin has share_a > 0 (bins ARE
    # period-A deciles), but under heavy ties equal adjacent deciles
    # CAN leave a bin that only period-B rows land in — so the oracle
    # now carries the same share_a > 0 CASE guard the helper applies
    # (NULL chi2_term, excluded from the quantized total; ADVICE r7)
    out = _drift_stats(counts, "bin")
    return out.withColumn("bin", F.col("bin").cast("int"))


@query(
    "events_type_drift",
    oracle=f"""
    WITH counts AS (
      SELECT event_type,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-25' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-25' THEN 0 ELSE 1 END) AS n_b
      FROM events GROUP BY event_type),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    s AS (SELECT event_type, n_a, n_b,
                 CAST(n_a AS DOUBLE) / (SELECT ta FROM tot) AS share_a,
                 CAST(n_b AS DOUBLE) / (SELECT tb FROM tot) AS share_b
          FROM counts),
    t AS (SELECT event_type, n_a, n_b, share_a, share_b,
                 abs(share_b - share_a) AS abs_shift,
                 CASE WHEN share_a > 0
                      THEN (share_b - share_a) * (share_b - share_a) / share_a
                      ELSE NULL END AS chi2_term
          FROM s)
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           share_a, share_b, abs_shift, chi2_term,
           (SELECT CAST(SUM(CAST(floor(chi2_term * {_DRIFT_QSCALE})
                                 AS BIGINT)) AS BIGINT)
            FROM t WHERE chi2_term IS NOT NULL) AS chi2_total_q
    FROM t
    """,
)
def events_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATEGORICAL drift — the binning-free twin of
    ``orders_price_drift``: event-type population shares compared
    between two periods directly on the category labels (no decile
    edges needed), same chi-square/abs-shift statistics with the same
    int64-quantized order-independent total. Categories absent from
    the reference period surface with a NULL chi2_term (a NEW
    category is a schema-drift signal, not a division by zero) and
    are excluded from the quantized total in both engines. One
    aggregate over the fact table; everything after is
    category-cardinality-sized."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-25").cast("timestamp")
    counts = ev.groupBy("event_type").agg(
        F.sum((F.col("ts") < split).cast("long")).alias("n_a"),
        F.sum((F.col("ts") >= split).cast("long")).alias("n_b"),
    )
    return _drift_stats(counts, "event_type")


_WM_BIN = 65536  # cents per bin: ~160 bins over the TPC-H price range


@query(
    "lineitem_weighted_median",
    oracle="""
    WITH b AS (SELECT l_returnflag AS flag,
                      CAST(round(CAST(l_extendedprice AS DOUBLE) * 100)
                           AS BIGINT) AS cents,
                      CAST(l_quantity AS BIGINT) AS w,
                      l_orderkey AS ok, l_linenumber AS ln
               FROM lineitem),
    t AS (SELECT flag, SUM(w) AS tw FROM b GROUP BY flag),
    r AS (SELECT b.flag, cents, t.tw,
                 SUM(w) OVER (PARTITION BY b.flag
                              ORDER BY cents, ok, ln
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS run
          FROM b JOIN t ON t.flag = b.flag)
    SELECT flag,
           CAST(tw AS BIGINT) AS total_weight,
           CAST((tw + 1) // 2 AS BIGINT) AS target,
           CAST(MIN(CASE WHEN run >= (tw + 1) // 2 THEN cents END)
                AS BIGINT) AS median_cents,
           CAST(MIN(CASE WHEN run >= (tw + 1) // 2 THEN cents END)
                AS DOUBLE) / 100.0 AS weighted_median
    FROM r GROUP BY flag, tw
    """,
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median (quantity-weighted price per return flag)
    via the scalable two-pass bin-then-refine algorithm — the oracle
    states the direct definition (smallest value whose running weight
    reaches ceil(W/2) under a total order), so the hash match proves
    the two-pass algorithm EQUALS the definition:

    1. pass A aggregates weights into ~160 fixed-width price bins and
       walks the per-group cumulative over the BIN table (bounded by
       price-range/bin-width — a constant, never data-sized) to locate
       each group's target bin and the weight accumulated before it;
    2. pass B scans ONLY the target bin's rows (~1/160 of the data),
       resumes the running weight from the carried prefix, and picks
       the crossing row.

    The naive form — one running-weight window over every row per
    group — sorts the whole table through 3 fat partitions; the
    two-pass form's only data-sized work is two scans and a bin-sized
    shuffle. All arithmetic is integer (cents, integer weights,
    ceil-half target), so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    ).withColumn("bin", F.expr(f"cents DIV {_WM_BIN}"))
    ga = base.groupBy("flag", "bin").agg(F.sum("w").alias("bw"))
    tot = ga.groupBy("flag").agg(F.sum("bw").alias("tw"))
    cw = (
        W.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ga2 = (
        ga.join(F.broadcast(tot), "flag")
        .withColumn("cum", F.sum("bw").over(cw))
        .withColumn("target", F.expr("(tw + 1) DIV 2"))
    )
    tb = (
        ga2.filter(F.col("cum") >= F.col("target"))
        .groupBy("flag", "tw", "target")
        .agg(F.min(F.struct("bin", "cum", "bw")).alias("s"))
        .select(
            "flag",
            "tw",
            "target",
            F.col("s.bin").alias("mbin"),
            (F.col("s.cum") - F.col("s.bw")).alias("cum_before"),
        )
    )
    rw = (
        W.partitionBy("flag")
        .orderBy("cents", "ok", "ln")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    passb = (
        base.join(
            F.broadcast(tb),
            (base["flag"] == tb["flag"]) & (base["bin"] == tb["mbin"]),
        )
        .drop(tb["flag"])
        .withColumn("run", F.col("cum_before") + F.sum("w").over(rw))
    )
    return (
        passb.filter(F.col("run") >= F.col("target"))
        .groupBy("flag", "tw", "target")
        .agg(F.min("cents").alias("median_cents"))
        .select(
            "flag",
            F.col("tw").cast("long").alias("total_weight"),
            F.col("target").cast("long").alias("target"),
            F.col("median_cents").cast("long").alias("median_cents"),
            (F.col("median_cents").cast("double") / 100.0).alias(
                "weighted_median"
            ),
        )
    )
