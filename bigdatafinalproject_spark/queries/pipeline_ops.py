"""Training-data pipeline queries: time-series regularization,
repetition-based quality filtering, mixture-weighted sampling, and
benchmark-contamination checks.

All net-new surface (no reference equivalent — the reference has no
event-time or corpus-hygiene processing; SURVEY §2.10, §7.7): the
operations an LLM data pipeline runs between raw corpus and tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum, oracle_hash64, portable_hash64
from bigdatafinalproject_spark.operators.dedup import contamination, fuzzy_name_pairs
from bigdatafinalproject_spark.operators.features import (
    grouped_split,
    hashed_bow,
    standardize,
)
from bigdatafinalproject_spark.operators.text import (
    norm_text,
    quality_score,
    repetition_stats,
    tokens,
)
from bigdatafinalproject_spark.operators.timeseries import resample_ffill
from bigdatafinalproject_spark.queries.text_dedup import _NORM, _TOKS
from bigdatafinalproject_spark.registry import query

# BPE-ish token classes: letter runs, digit runs, punctuation runs —
# the pattern subset that means the same thing in Java regex and RE2
_BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

# mixture-sampling rates, permille kept per language (downsample the
# dominant language, keep the rest dense); unknown languages -> 500
_MIX_PERMILLE = {"en": 350, "fr": 900, "de": 900, "es": 700, "zh": 800}
_MIX_DEFAULT = 500
_MIX_SEED = 11


@query(
    "events_resample_ffill",
    oracle="""
    WITH per_bucket AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
               FROM per_bucket GROUP BY 1),
    spine AS (SELECT event_type,
                     unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
              FROM bounds),
    j AS (SELECT s.event_type, s.bucket, p.v, p.n_events
          FROM spine s LEFT JOIN per_bucket p USING (event_type, bucket))
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap,
           COALESCE(n_events, 0) AS n_events,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
    FROM j
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of the irregular event stream per event_type with
    a densified time spine and forward-filled values
    (operators/timeseries.resample_ffill): gaps become explicit rows,
    carried values stay exact via the decimal-sum per bucket."""
    e = load_table(spark, sf_dir, "events")
    out = resample_ffill(
        e, "ts", ["event_type"], dsum(F.col("value")), unit="hour"
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "was_gap",
        "n_events",
        "v_fill",
    )


@query(
    "doc_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS n,
            list_max(list_transform(list_distinct(toks),
                     x -> len(list_filter(toks, tk -> tk = x)))) AS top_cnt,
            CASE WHEN len(toks) >= 2 THEN
              list_transform(generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1])
            ELSE [] END AS bg
          FROM t)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(top_cnt AS INT) AS top_token_cnt,
           CAST(top_cnt AS DOUBLE) / n AS top_token_frac,
           CASE WHEN len(bg) > 0
                THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
                ELSE 0.0 END AS dup_bigram_frac,
           CAST(CASE WHEN CAST(top_cnt AS DOUBLE) / n > 0.2
                       OR (len(bg) > 0 AND
                           CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
                               / len(bg) > 0.2)
                THEN 1 ELSE 0 END AS INT) AS repetitive
    FROM b
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (top-token fraction,
    duplicate-bigram fraction) — pure per-row array expressions, no
    shuffle (operators/text.repetition_stats)."""
    return repetition_stats(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {p}" for lang, p in _MIX_PERMILLE.items()
    )
    return f"CASE lang {whens} ELSE {_MIX_DEFAULT} END"


@query(
    "doc_mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST({oracle_hash64('doc_id', seed=_MIX_SEED)} % 1000 AS INT)
               AS permille
    FROM documents
    WHERE {oracle_hash64('doc_id', seed=_MIX_SEED)} % 1000 < {_mix_case_sql()}
    """,
)
def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus sampling: per-language keep rates applied
    via a deterministic portable hash of doc_id — reproducible across
    runs, engines, and partitionings (no rand()), and a pure filter, so
    it costs one scan at any scale."""
    d = load_table(spark, sf_dir, "documents")
    rate_map = F.create_map(
        *[F.lit(x) for kv in _MIX_PERMILLE.items() for x in kv]
    )
    permille = F.pmod(portable_hash64("doc_id", seed=_MIX_SEED), F.lit(1000))
    rate = F.coalesce(
        F.element_at(rate_map, F.col("lang")), F.lit(_MIX_DEFAULT)
    )
    return d.filter(permille < rate).select(
        "doc_id", "lang", "source", permille.cast("int").alias("permille")
    )


@query(
    "part_fuzzy_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    nb AS (SELECT name,
                  list_extract(string_split(name, ' '),
                               len(string_split(name, ' '))) AS blk
           FROM names)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM nb a JOIN nb b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 3
    """,
)
def part_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching (operators/dedup.fuzzy_name_pairs): distinct
    vocabulary -> block by last token -> Levenshtein <= 3. The quadratic
    step touches vocab-per-block rows only, never the table."""
    return fuzzy_name_pairs(load_table(spark, sf_dir, "part"), "p_name", max_dist=3)


@query(
    "events_trailing_window",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS n_trailing,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS sum_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event-time window per user (RANGE frame over
    epoch-microseconds — exact integer ordering, so frame boundaries and
    tie groups are engine-identical; the sliding sum accumulates in
    DECIMAL, so Spark's per-row frame recompute and DuckDB's segment
    tree produce the same double). At scale Spark recomputes each frame
    (no retraction): for frames spanning millions of rows, pre-bucket to
    a coarser grain first (resample_ffill) and slide over buckets."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col("value").cast("decimal(25,6)")).over(w)
        .cast("double")
        .alias("sum_trailing"),
    )


@query(
    "lineitem_standardize",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))
                      * CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
      FROM lineitem GROUP BY 1),
    s AS (SELECT l_returnflag, sx / n AS mean,
                 sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS std, mn, mx
          FROM m)
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_quantity AS x,
           (l.l_quantity - s.mean) / s.std AS z,
           (l.l_quantity - s.mn) / (s.mx - s.mn) AS minmax
    FROM lineitem l JOIN s USING (l_returnflag)
    """,
)
def lineitem_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score + min-max feature scaling
    (operators/features.standardize): one moments pass per group,
    moments broadcast back — the fact side never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    out = standardize(li, "l_quantity", ["l_returnflag"])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        "z",
        "minmax",
    )


@query(
    "doc_hashed_bow",
    oracle=f"""
    SELECT doc_id,
           CAST({oracle_hash64('tok')} % 64 AS INT) AS slot,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
    GROUP BY 1, 2
    """,
)
def doc_hashed_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words featurization
    (operators/features.hashed_bow): fixed 64-dim sparse vectors with no
    vocabulary pass — one explode + one combinable aggregation."""
    return hashed_bow(load_table(spark, sf_dir, "documents"), "text", "doc_id", dim=64)


@query(
    "doc_grouped_split",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN {oracle_hash64('source', seed=17)} % 1000 < 800 THEN 'train'
                WHEN {oracle_hash64('source', seed=17)} % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def doc_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split assignment (operators/features.grouped_split):
    the split hashes the SOURCE, so near-duplicate documents from one
    source can never straddle train/test. Pure expression, zero extra
    passes."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "source", grouped_split(d, "source").alias("split")
    )


@query(
    "doc_bpe_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_BPE_PAT}') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-z]'))) AS INT)
               AS n_alpha,
           CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))) AS INT)
               AS n_num
    FROM t
    """,
)
def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (letter / digit / punctuation runs —
    the pre-tokenization split every BPE tokenizer applies before
    merges): per-doc token counts by class, pure per-row expressions
    over regexp_extract_all, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
    b = d.select(F.col("doc_id"), toks.alias("toks"))
    return b.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.expr("filter(toks, x -> x rlike '^[a-z]')")).alias("n_alpha"),
        F.size(F.expr("filter(toks, x -> x rlike '^[0-9]')")).alias("n_num"),
    )


@query(
    "events_histogram",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    binned AS (
      SELECT least(CAST(floor(((value - lo) / (hi - lo)) * 20) AS INT), 19)
                 AS bin, lo, hi
      FROM events, b)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           lo + bin * ((hi - lo) / 20) AS bin_lo,
           lo + (bin + 1) * ((hi - lo) / 20) AS bin_hi
    FROM binned GROUP BY bin, lo, hi
    """,
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram with data-driven bounds: one min/max
    pass, bounds broadcast (literal cross join), then a combinable
    count per bin — two scans total at any scale. Bin arithmetic is a
    fixed sequence of double ops, so edges are engine-identical."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = e.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor(((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))) * 20)
            .cast("int"),
            F.lit(19),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "bin",
        "n",
        (F.col("lo") + F.col("bin") * ((F.col("hi") - F.col("lo")) / 20)).alias("bin_lo"),
        (F.col("lo") + (F.col("bin") + 1) * ((F.col("hi") - F.col("lo")) / 20)).alias(
            "bin_hi"
        ),
    )


@query(
    "customer_profile",
    oracle="""
    SELECT 'c_custkey' AS column_name,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_name',
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'c_nationkey',
           CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'c_mktsegment',
           CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) FROM customer
    """,
)
def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling in ONE aggregation pass: null and distinct counts
    for every profiled column as a single wide agg, unpivoted to one
    row per column with stack — the oracle's 4-way UNION reads the
    table four times; the engine reads it once. At 100 TB swap
    count_distinct for approx_count_distinct per column (same shape)."""
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    aggs = []
    for col in cols:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_n_{col}")
        )
        aggs.append(F.countDistinct(col).alias(f"_d_{col}"))
    wide = c.agg(*aggs)
    stack_args = ", ".join(f"'{col}', _n_{col}, _d_{col}" for col in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        )
    )


@query(
    "customer_name_parse",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS parsed_id,
           regexp_extract(c_name, '^([A-Za-z]+)#', 1) AS entity,
           CAST(CASE WHEN CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
                          = c_custkey
                THEN 1 ELSE 0 END AS INT) AS id_consistent
    FROM customer
    """,
)
def customer_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured extraction with regexp_extract capture groups (§2.8
    string family): parse the entity prefix and numeric id out of the
    formatted name and cross-check the id against the key — the
    schema-on-read validation pattern for semi-structured columns."""
    c = load_table(spark, sf_dir, "customer")
    parsed = F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long")
    return c.select(
        "c_custkey",
        "c_name",
        parsed.alias("parsed_id"),
        F.regexp_extract("c_name", r"^([A-Za-z]+)#", 1).alias("entity"),
        (parsed == F.col("c_custkey")).cast("int").alias("id_consistent"),
    )


@query(
    "part_bayesian_rating",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS DOUBLE) AS v,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s
      FROM lineitem GROUP BY 1),
    g AS (
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*) AS c
      FROM lineitem)
    SELECT l_partkey,
           CAST(v AS BIGINT) AS n,
           s / v AS raw_avg,
           (v / (v + 20.0)) * (s / v) + (20.0 / (v + 20.0)) * c
               AS smoothed_avg
    FROM per_part, g
    """,
)
def part_bayesian_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-smoothed per-item average (the IMDB weighted-rating
    formula): shrink low-evidence items toward the global mean with
    prior weight m=20 — the principled version of the reference's
    'count >= 20' popularity cutoff (ALS_model3.py:188). One grouped
    pass + a 1-row global frame broadcast; every division is a fixed
    double op over decimal-exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        dsum(F.col("l_quantity")).alias("s"),
    )
    g = li.agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("c")
    )
    v, s, c = F.col("v"), F.col("s"), F.col("c")
    return per.crossJoin(F.broadcast(g)).select(
        "l_partkey",
        v.cast("long").alias("n"),
        (s / v).alias("raw_avg"),
        ((v / (v + F.lit(20.0))) * (s / v) + (F.lit(20.0) / (v + F.lit(20.0))) * c)
        .alias("smoothed_avg"),
    )


@query(
    "nation_revenue_share",
    oracle="""
    WITH per_nation AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DECIMAL(38,6))
                 AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1)
    SELECT c_nationkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
               / CAST(SUM(rev) OVER () AS DOUBLE) AS share,
           CAST(rank() OVER (ORDER BY rev DESC, c_nationkey) AS INT)
               AS rev_rank
    FROM per_nation
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution: per-nation revenue share via an
    unpartitioned window over the 25-row aggregate (the global window
    runs on GROUPED rows — bounded by group count, never by table size
    — so the reference's global-window anti-pattern does not apply).
    The total is summed in DECIMAL inside the window, exact in any
    order."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    per = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
             .cast("decimal(38,6)").alias("rev"))
    )
    total = F.sum("rev").over(W.partitionBy())
    return per.select(
        "c_nationkey",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / total.cast("double")).alias("share"),
        F.rank()
        .over(W.orderBy(F.col("rev").desc(), "c_nationkey"))
        .cast("int")
        .alias("rev_rank"),
    )


@query(
    "part_abc_analysis",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(38,6))
                 AS rev
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
             SUM(rev) OVER () AS total
      FROM per_part)
    SELECT l_partkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8 THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r
    """,
)
def part_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: items ranked by revenue, classified
    by cumulative share (A <= 80 %, B <= 95 %, C rest). The running
    total uses operators/cumsum.running_sum — range-partition on the
    ordering keys + parallel per-partition prefix sums + broadcast
    offsets — so no stage holds the whole item aggregate in one task
    (the r1 global-window version did; SURVEY §4.3-1). The grand total
    is a scalar aggregate broadcast back, not an unpartitioned window.
    Sums accumulate in DECIMAL (exact in any order)."""
    from bigdatafinalproject_spark.operators.barrier import materialize_barrier
    from bigdatafinalproject_spark.operators.cumsum import running_sum

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("decimal(38,6)")
        .alias("rev")
    )
    # barrier the item-sized aggregate ONCE: both consumers below (the
    # prefix-sum lineage and the grand total) otherwise re-run the full
    # lineitem scan + shuffle — measured 4.5x slower at sf0.1
    per = materialize_barrier(per)
    cum = running_sum(
        per, "rev", order_by=[F.col("rev").desc(), F.col("l_partkey")],
        out_col="_cum",
    )
    total = per.agg(F.sum("rev").alias("_total"))
    share = F.col("_cum").cast("double") / F.col("_total").cast("double")
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
            share.alias("cum_share"),
            F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
            .alias("abc_class"),
        )
    )


@query(
    "basket_pair_lift",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM lineitem),
    freq AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS f
             FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS together
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT part_a, part_b, together,
           CAST(together AS DOUBLE) / n_orders AS support,
           (CAST(together AS DOUBLE) / n_orders)
             / ((fa.f / n_orders) * (fb.f / n_orders)) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b, n
    """,
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: co-occurrence counts, support, and
    lift for part pairs bought in the same order (min support count 3).
    The self-join is per-basket — cost is sum(lines-per-order^2), not
    table^2; at 100 TB prune hot items by frequency cap first (the
    jaccard stop-shingle pattern) and let AQE handle basket skew. Every
    ratio is a fixed double op over exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("_fa"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("_fb"))
    t = F.col("together").cast("double")
    no = F.col("n_orders")
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "together",
            (t / no).alias("support"),
            ((t / no) / ((F.col("_fa") / no) * (F.col("_fb") / no))).alias("lift"),
        )
    )


@query(
    "orders_scd2",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderstatus,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 validity intervals from an event history: each order
    becomes a [valid_from, valid_to) range per customer via lead(), the
    open range marking the current record — the standard
    snapshot-to-dimension transform, one window, one shuffle on the
    partition key."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@query(
    "customer_stratified_k",
    oracle=f"""
    WITH r AS (
      SELECT c_custkey, c_nationkey,
             row_number() OVER (
                 PARTITION BY c_nationkey
                 ORDER BY {oracle_hash64('c_custkey', seed=23)}, c_custkey)
                 AS rn
      FROM customer)
    SELECT c_custkey, c_nationkey, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 5
    """,
)
def customer_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside
    each stratum by a portable hash of the key (reproducible
    'randomness' across runs, engines, partitionings — the engine's
    replacement for rand()-ordered sampling, SURVEY §4.3-6) and keep
    rank <= k. One window, one shuffle on the stratum key."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    rn = F.row_number().over(
        W.partitionBy("c_nationkey").orderBy(
            portable_hash64("c_custkey", seed=23), "c_custkey"
        )
    )
    return (
        c.select("c_custkey", "c_nationkey", rn.alias("rn"))
        .filter(F.col("rn") <= 5)
    )


@query(
    "corpus_curation",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             CAST(length(text) AS INT) AS raw_len,
             CAST(length(lower(text))
                  - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
                 AS INT) AS punct,
             {_TOKS} AS toks
      FROM documents),
    r AS (
      SELECT doc_id,
             CAST(punct AS DOUBLE) / raw_len AS punct_ratio,
             CAST(len(list_filter(toks,
                  x -> x IN ('the','a','of','and','to','in','is','it','that','for')))
                  AS DOUBLE) / len(toks) AS stopword_ratio,
             CAST(len(toks) AS INT) AS n_tokens
      FROM c),
    q AS (
      SELECT doc_id,
             1.0 - least(punct_ratio * 2, 0.5)
                 - CASE WHEN stopword_ratio < 0.05 THEN 0.25 ELSE 0.0 END
                 - CASE WHEN n_tokens < 10 THEN 0.25 ELSE 0.0 END AS quality
      FROM r),
    base AS (
      SELECT d.doc_id, d.lang, d.source, d.text, q.quality
      FROM documents d JOIN q USING (doc_id) WHERE q.quality >= 0.8),
    dd AS (SELECT *, md5({_NORM}) AS digest FROM base),
    k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS min_id FROM dd),
    s AS (SELECT * FROM k
          WHERE doc_id = min_id
            AND {oracle_hash64('doc_id', seed=_MIX_SEED)} % 1000 <
                CASE lang WHEN 'en' THEN 350 WHEN 'fr' THEN 900
                          WHEN 'de' THEN 900 WHEN 'es' THEN 700
                          WHEN 'zh' THEN 800 ELSE 500 END)
    SELECT doc_id, lang, source, quality,
           CASE WHEN {oracle_hash64('source', seed=17)} % 1000 < 800 THEN 'train'
                WHEN {oracle_hash64('source', seed=17)} % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM s
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the operators composed into the
    production flow: quality filter (>= 0.8) -> exact dedup (keep the
    min doc_id per normalized-content digest) -> mixture-weighted
    sampling (per-language hash rates) -> leakage-safe grouped split.
    Every stage is the same portable primitive its standalone query
    uses, so the whole pipeline stays oracle-checkable; physically it
    is one scan, one metrics join, one window over digest, then pure
    filters."""
    d = load_table(spark, sf_dir, "documents")
    q = quality_score(d, "text", "doc_id").select("doc_id", "quality")
    base = d.join(q, "doc_id").filter(F.col("quality") >= 0.8)
    from pyspark.sql import Window as W

    dd = base.withColumn("digest", F.md5(norm_text(F.col("text"))))
    kept = dd.withColumn(
        "_min_id", F.min("doc_id").over(W.partitionBy("digest"))
    ).filter(F.col("doc_id") == F.col("_min_id"))
    permille = F.pmod(portable_hash64("doc_id", seed=_MIX_SEED), F.lit(1000))
    rate = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in _MIX_PERMILLE.items() for x in kv]),
            F.col("lang"),
        ),
        F.lit(_MIX_DEFAULT),
    )
    sampled = kept.filter(permille < rate)
    return sampled.select(
        "doc_id",
        "lang",
        "source",
        "quality",
        grouped_split(sampled, "source").alias("split"),
    )


@query(
    "doc_bigram_lm",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                         i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
           FROM t WHERE len(toks) >= 2),
    c2 AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    r AS (SELECT c2.w1, c2.w2, c2.c12, c1.c1,
                 CAST(c2.c12 AS DOUBLE) / c1.c1 AS cond_p,
                 row_number() OVER (PARTITION BY c2.w1
                                    ORDER BY c2.c12 DESC, c2.w2) AS rn
          FROM c2 JOIN c1 USING (w1))
    SELECT w1, w2, c12, c1, cond_p FROM r WHERE rn <= 5
    """,
)
def doc_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model counts: P(w2|w1) from exact bigram /
    unigram-context counts, top-5 continuations per context. The
    unigram count reuses the bigram aggregate (SUM over c12 — no second
    corpus pass); per-row bigram arrays explode map-side; both
    aggregations combine partially before the shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.col("toks")
    b = (
        d.select(tokens(F.col("text")).alias("toks"))
        .filter(F.size(toks) >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c2 = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c2.groupBy("w1").agg(F.sum("c12").alias("c1"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("w1").orderBy(F.col("c12").desc(), F.col("w2"))
    )
    return (
        c2.join(c1, "w1")
        .withColumn("cond_p", F.col("c12").cast("double") / F.col("c1"))
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= 5)
        .select("w1", "w2", "c12", "c1", "cond_p")
    )


@query(
    "doc_contamination",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_NORM} AS t FROM documents
               WHERE length({_NORM}) >= 8),
    sh AS (SELECT DISTINCT doc_id, source,
                  substr(t, CAST(i AS INT), 8) AS shingle
           FROM d, LATERAL unnest(range(1, length(t) - 6)) AS u(i)),
    bs AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    m AS (SELECT sh.doc_id,
                 CASE WHEN bs.shingle IS NULL THEN 0 ELSE 1 END AS hit
          FROM sh LEFT JOIN bs ON sh.shingle = bs.shingle
          WHERE sh.source <> 'src0')
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(hit) AS BIGINT) AS n_contaminated,
           CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS contaminated_frac,
           CAST(CASE WHEN CAST(SUM(hit) AS DOUBLE) / COUNT(*) >= 0.5
                THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM m GROUP BY doc_id
    """,
)
def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each train doc's
    char-8-gram shingles present in the benchmark slice (source =
    'src0'), benchmark shingle set broadcast
    (operators/dedup.contamination)."""
    d = load_table(spark, sf_dir, "documents")
    return contamination(
        d, "text", "doc_id", F.col("source") == "src0", n=8, flag_threshold=0.5
    )


@query(
    "doc_lm_familiarity",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
           FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)
           WHERE len(toks) >= 2),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c12) AS BIGINT) AS sum_c12,
           CAST(SUM(c12) AS DOUBLE) / COUNT(*) AS familiarity
    FROM bg JOIN c2 USING (w1, w2)
    GROUP BY bg.doc_id
    """,
)
def doc_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-model familiarity (a perplexity proxy in
    exact integer arithmetic): mean corpus frequency of the doc's
    bigrams — low scores flag novel/outlier text for curation triage.
    Float perplexity would need log-prob sums whose order drifts across
    engines; integer bigram counts with ONE final double division are
    bit-portable. Self-training then scoring is two passes over the
    same map-side bigram explode; the (w1, w2) count join is the only
    data-sized shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return (
        bg.join(c2, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c12").alias("sum_c12"),
            (F.sum("c12").cast("double") / F.count(F.lit(1))).alias("familiarity"),
        )
    )
