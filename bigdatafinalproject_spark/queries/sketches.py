"""Count-min-sketch frequency estimation (net-new sketch surface;
pairs with the mergeable HLL distinct sketches in queries/sql_json.py).

The DuckDB oracle replays the identical (depth x width) counter grid —
same md5-derived base hash, same affine row family, same min-over-rows
estimate — so the frequency ESTIMATES (not just a thresholded set)
hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.sketches import (
    cell_sql,
    cms_estimates,
    h31_sql,
)
from bigdatafinalproject_spark.registry import query

_DEPTH, _WIDTH = 4, 64
_PROBE_MOD = 97  # probe set: user_id % 97 == 0 — bounded, deterministic


def _cms_oracle(table: str, key: str) -> str:
    cells = "\n      UNION ALL ".join(
        f"SELECT {r} AS r, {cell_sql('h', r, _WIDTH)} AS cell FROM hashed"
        for r in range(_DEPTH)
    )
    probes = "\n      UNION ALL ".join(
        f"SELECT {key}, {r} AS r, {cell_sql('h', r, _WIDTH)} AS cell FROM khashed"
        for r in range(_DEPTH)
    )
    return f"""
    WITH hashed AS (SELECT {h31_sql(key)} AS h FROM {table}),
    cells AS ({cells}),
    sketch AS (SELECT r, cell, COUNT(*) AS c FROM cells GROUP BY r, cell),
    keys AS (SELECT DISTINCT {key} FROM {table}
             WHERE {key} % {_PROBE_MOD} = 0),
    khashed AS (SELECT {key}, {h31_sql(key)} AS h FROM keys),
    probes AS ({probes})
    SELECT {key}, CAST(MIN(c) AS BIGINT) AS est_count
    FROM probes JOIN sketch USING (r, cell) GROUP BY {key}
    """


@query("cms_user_frequency", oracle=_cms_oracle("events", "user_id"))
def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS event-count estimates for a probe panel of users.

    The sketch is built once over the full event stream (one (r, cell)
    groupBy: <= 256 shuffled rows per partition regardless of input
    size; mergeable across shards/days by cell-wise addition); point
    queries for the probe panel answer from the broadcast 256-cell grid
    with no second scan of the events. est_count >= true count by
    construction — the oracle proves the exact estimates, collisions
    included.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    probes = ev.filter(F.col("user_id") % _PROBE_MOD == 0).distinct()
    return cms_estimates(ev, "user_id", probes, depth=_DEPTH, width=_WIDTH)


def _cms_join_oracle() -> str:
    def side(table: str, key: str, name: str) -> str:
        cells = "\n      UNION ALL ".join(
            f"SELECT {r} AS r, {cell_sql('h', r, _WIDTH)} AS cell FROM {name}_h"
            for r in range(_DEPTH)
        )
        return (
            f"{name}_h AS (SELECT {h31_sql(key)} AS h FROM {table}),\n"
            f"    {name}_cells AS ({cells}),\n"
            f"    {name}_sk AS (SELECT r, cell, COUNT(*) AS c"
            f" FROM {name}_cells GROUP BY r, cell)"
        )

    return f"""
    WITH {side("orders", "o_custkey", "a")},
    {side("customer", "c_custkey", "b")},
    ip AS (SELECT a_sk.r, SUM(a_sk.c * b_sk.c) AS ip
           FROM a_sk JOIN b_sk USING (r, cell) GROUP BY a_sk.r)
    SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM ip
    """


@query("cms_join_size_estimate", oracle=_cms_join_oracle())
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders-customer join cardinality estimated from the two CMS
    grids alone (CM inner-product estimator, >= the true size).

    The planner use-case: size a prospective join from two 256-row
    sketches without re-scanning either table — at 100 TB the sketches
    are the only thing that moves.
    """
    from bigdatafinalproject_spark.operators.sketches import cms_join_size

    return cms_join_size(
        load_table(spark, sf_dir, "orders").select("o_custkey"),
        "o_custkey",
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        depth=_DEPTH,
        width=_WIDTH,
    )


_QBINS = 256


@query(
    "events_value_quantiles",
    oracle=f"""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n
               FROM events),
    binned AS (SELECT least(CAST(floor(((value - lo) / (hi - lo)) * {_QBINS})
                                 AS INT), {_QBINS - 1}) AS bin
               FROM events, b),
    hist AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
    cum AS (SELECT a.bin, a.cnt, SUM(h2.cnt) AS cum
            FROM hist a JOIN hist h2 ON h2.bin <= a.bin GROUP BY a.bin, a.cnt),
    qs AS (SELECT CAST(0.5 AS DOUBLE) AS q
           UNION ALL SELECT CAST(0.95 AS DOUBLE)
           UNION ALL SELECT CAST(0.99 AS DOUBLE)),
    t AS (SELECT q, CAST(ceil(q * (SELECT CAST(n AS DOUBLE) FROM b)) AS DOUBLE)
                     AS target
          FROM qs),
    chosen AS (SELECT t.q, t.target, MIN(c.bin) AS bin
               FROM t JOIN cum c ON CAST(c.cum AS DOUBLE) >= t.target
               GROUP BY t.q, t.target),
    sel AS (SELECT ch.q, ch.target, ch.bin, c.cnt, c.cum
            FROM chosen ch JOIN cum c USING (bin))
    SELECT q,
           (SELECT lo FROM b)
           + bin * (((SELECT hi FROM b) - (SELECT lo FROM b)) / {_QBINS})
           + (((SELECT hi FROM b) - (SELECT lo FROM b)) / {_QBINS})
             * ((target - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
               AS est_value
    FROM sel
    """,
)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of events.value from a 256-bin mergeable histogram
    sketch (error <= one bin width; exact percentiles exist separately
    in the percentile family — this is the streaming/sharded-merge
    path). Cumulation is a triangular broadcast join over the 256-row
    histogram, not a single-partition window.
    """
    from bigdatafinalproject_spark.operators.sketches import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "events"), "value",
        qs=(0.5, 0.95, 0.99), bins=_QBINS,
    )


@query("stream_cms_user_frequency", oracle=_cms_oracle("events", "user_id"))
def stream_cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME probe-panel estimates as cms_user_frequency, but the
    sketch is maintained INCREMENTALLY by a stream: each micro-batch
    writes its own partial grid (stateless foreachBatch, idempotent
    batch paths), and the queryable sketch is the bin-wise sum of the
    partials. Sharing cms_user_frequency's oracle IS the theorem: the
    merge of per-batch sketches equals the one-shot global sketch."""
    from bigdatafinalproject_spark.operators.sketches import (
        estimates_from_sketch,
    )
    from bigdatafinalproject_spark.streaming.sketches import stream_cms_sketch

    sketch, _ = stream_cms_sketch(spark, sf_dir, depth=_DEPTH, width=_WIDTH)
    ev = load_table(spark, sf_dir, "events").select("user_id")
    probes = ev.filter(F.col("user_id") % _PROBE_MOD == 0).distinct()
    return estimates_from_sketch(sketch, probes, "user_id", _DEPTH, _WIDTH)


from bigdatafinalproject_spark.operators.barrier import materialize_barrier  # noqa: E402
from bigdatafinalproject_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_oracle_cte,
    hll_oracle_estimate,
    hll_register_table,
)

_HLL_ORACLE = f"""
    WITH {hll_oracle_cte("customer", "c_custkey", "c_nationkey")},
    per AS ({hll_oracle_estimate("hllm", "c_nationkey")}),
    ex AS (SELECT c_nationkey, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact
           FROM customer GROUP BY 1),
    gm AS (SELECT idx, MAX(M) AS M FROM hllm GROUP BY 1),
    g_est AS ({hll_oracle_estimate("gm")})
    SELECT CAST(per.c_nationkey AS INT) AS c_nationkey, ex.n_exact, per.n_est,
           per.n_zero_regs
    FROM per JOIN ex ON per.c_nationkey = ex.c_nationkey
    UNION ALL
    SELECT -1 AS c_nationkey,
           (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS n_exact,
           (SELECT n_est FROM g_est) AS n_est,
           (SELECT n_zero_regs FROM g_est) AS n_zero_regs
    """


@query("customer_hll_portable", oracle=_HLL_ORACLE)
def customer_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct-count sketch, ORACLE-CHECKED: the
    md5-register twin of customer_hll_distinct (whose DataSketches
    binary layout forces a rows-only check). Per-nation register
    tables (<= 256 rows each out of one groupBy) estimate per-nation
    distinct customers; the GLOBAL row is produced by MERGING the
    per-nation registers (max per idx) — never rescanning the data —
    which is the 100 TB pattern: sketch each shard/day once, answer
    any rollup by merging bounded register tables. DuckDB replays the
    registers and the exact integer-arithmetic estimate bit-for-bit
    (trailing-zero rho, int64 power sums, one final double divide).
    n_exact rides along per group for error inspection."""
    c = load_table(spark, sf_dir, "customer")
    # regs feeds BOTH the per-nation estimate and the global merge —
    # barrier before fan-out (NOTES.md discipline)
    regs = materialize_barrier(
        hll_register_table(c, "c_custkey", ["c_nationkey"])
    )
    per = hll_estimate(regs, ["c_nationkey"])
    ex = c.groupBy("c_nationkey").agg(
        F.countDistinct("c_custkey").alias("n_exact")
    )
    per_rows = per.join(ex, "c_nationkey").select(
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "n_exact",
        "n_est",
        "n_zero_regs",
    )
    gm = regs.groupBy("idx").agg(F.max("M").cast("int").alias("M"))
    glob = (
        hll_estimate(gm, [])
        .crossJoin(
            F.broadcast(
                c.agg(F.countDistinct("c_custkey").alias("n_exact"))
            )
        )
        .select(
            F.lit(-1).cast("int").alias("c_nationkey"),
            "n_exact",
            "n_est",
            "n_zero_regs",
        )
    )
    return per_rows.unionByName(glob)


_STREAM_HLL_ORACLE = f"""
    WITH {hll_oracle_cte("events", "user_id", "0 AS g")},
    g_est AS ({hll_oracle_estimate("hllm")})
    SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact,
           (SELECT n_est FROM g_est) AS n_est,
           (SELECT n_zero_regs FROM g_est) AS n_zero_regs
    """


@query("stream_hll_user_distinct", oracle=_STREAM_HLL_ORACLE)
def stream_hll_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users, sketched INCREMENTALLY by a stream: each
    micro-batch writes its own partial HLL register table (stateless
    foreachBatch, idempotent batch paths) and the queryable sketch is
    the register-wise MAX of the partials. The oracle computes the
    one-shot global register table over the full events table —
    matching it IS the merge theorem (max of per-batch maxima = global
    max), the same discipline as stream_cms_user_frequency. max is
    also idempotent, so replayed batches are harmless — the
    exactly-once story needs only at-least-once delivery."""
    from bigdatafinalproject_spark.streaming.sketches import (
        stream_hll_registers,
    )

    regs, _ = stream_hll_registers(spark, sf_dir)
    est = hll_estimate(regs, [])
    ex = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        F.broadcast(ex)
        .crossJoin(est)
        .select("n_exact", "n_est", "n_zero_regs")
    )


_SET_ALG_ORACLE = f"""
    WITH seta AS (SELECT DISTINCT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING'),
    setb AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE o_orderpriority = '1-URGENT'),
    {hll_oracle_cte("seta", "c_custkey", "0 AS g", prefix="a")},
    {hll_oracle_cte("setb", "c_custkey", "0 AS g", prefix="b")},
    um AS (SELECT idx, MAX(M) AS M
           FROM (SELECT idx, M FROM ahllm UNION ALL SELECT idx, M FROM bhllm)
           GROUP BY idx),
    ea AS ({hll_oracle_estimate("ahllm")}),
    eb AS ({hll_oracle_estimate("bhllm")}),
    eu AS ({hll_oracle_estimate("um")})
    SELECT (SELECT n_est FROM ea) AS n_a_est,
           (SELECT n_est FROM eb) AS n_b_est,
           (SELECT n_est FROM eu) AS n_union_est,
           (SELECT n_est FROM ea) + (SELECT n_est FROM eb)
             - (SELECT n_est FROM eu) AS n_inter_est,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM seta JOIN setb USING (c_custkey)) AS n_inter_exact
    """


@query("customer_hll_set_algebra", oracle=_SET_ALG_ORACLE)
def customer_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set algebra: distinct-count estimates for two customer
    cohorts (BUILDING-segment vs urgent-order placers), their UNION by
    register-wise max merge, and their INTERSECTION by
    inclusion-exclusion — all from three bounded register tables,
    never rescanning or joining the raw sets (the exact intersection
    rides along only as the error reference). This is the sketch-
    algebra answer to audience-overlap questions at 100 TB: |A|, |B|,
    |A u B|, |A n B| from kilobytes of mergeable state. Register
    tables and every estimate replay bit-for-bit in DuckDB; the same
    left-to-right double arithmetic keeps inclusion-exclusion exact
    cross-engine."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    # each register table feeds its own estimate AND the union merge —
    # barrier before fan-out
    ra = materialize_barrier(hll_register_table(a, "c_custkey", []))
    rb = materialize_barrier(hll_register_table(b, "c_custkey", []))
    um = (
        ra.unionByName(rb)
        .groupBy("idx")
        .agg(F.max("M").cast("int").alias("M"))
    )
    ea = hll_estimate(ra, []).select(F.col("n_est").alias("n_a_est"))
    eb = hll_estimate(rb, []).select(F.col("n_est").alias("n_b_est"))
    eu = hll_estimate(um, []).select(F.col("n_est").alias("n_union_est"))
    inter_exact = a.join(b, "c_custkey", "left_semi").agg(
        F.count(F.lit(1)).alias("n_inter_exact")
    )
    return (
        F.broadcast(ea)
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(inter_exact))
        .select(
            "n_a_est",
            "n_b_est",
            "n_union_est",
            (
                F.col("n_a_est") + F.col("n_b_est") - F.col("n_union_est")
            ).alias("n_inter_est"),
            "n_inter_exact",
        )
    )
