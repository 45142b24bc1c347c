"""Count-min sketch: mergeable heavy-hitter estimation (net-new
surface, BASELINE.json north star; complements the HLL distinct
sketches in queries/sql_json.py).

A CMS is a (depth x width) grid of counters; each input key increments
one cell per row (cell = hash_r(key) % width); a key's frequency
estimate is the MIN over its depth cells — always >= the true count,
with bounded overestimate. Cormode & Muthukrishnan 2005.

Why this shape at 100 TB: the sketch is built by ONE groupBy over
(row, cell) — partial-aggregated map-side, shuffling at most
depth*width rows per partition regardless of input size — and two
sketches merge by cell-wise addition (the groupBy does exactly that
across partitions), so per-day / per-shard sketches union for free.
The estimate step broadcasts the tiny sketch (depth*width rows) and
never re-scans raw data.

Hash cost note: the grid rows use ONE md5-derived base hash per key
plus a Carter-Wegman affine family (a_r*h + b_r mod p, with LARGE
md5-derived per-row multipliers — see _row_consts for why small
structured multipliers are unsound) instead of depth independent md5s;
the base hash is materialized in its own projection so codegen
evaluates it once per row (4x less hashing; profiled 2x end-to-end at
sf0.1). All arithmetic is md5-derived and exactly replayed by the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import oracle_hash64, portable_hash64

_P = 2147483647  # Mersenne prime 2^31-1, same modulus as the minhash family


def _h31(key: Column) -> Column:
    """31-bit md5-derived base hash (one md5 per key)."""
    return portable_hash64(key, seed=0) % _P


def _row_consts(r: int) -> tuple[int, int]:
    """Carter-Wegman multiplier/offset for grid row r, md5-derived.

    The multipliers must be LARGE random odd-ish constants: with small
    structured multipliers like (2r+1), two keys whose base hashes
    differ by a multiple of ``width`` collide in EVERY row (the affine
    map preserves the difference's low bits), collapsing the
    (1/width)^depth full-depth collision bound to 1/width — found by
    test_cms_heavy_hitters_finds_skewed_keys_no_false_negatives.
    """
    import hashlib

    a = int(hashlib.md5(f"cms|a|{r}".encode()).hexdigest()[:15], 16) % (_P - 1) + 1
    b = int(hashlib.md5(f"cms|b|{r}".encode()).hexdigest()[:15], 16) % _P
    return a, b


def _cell(h31: Column, r: int, width: int) -> Column:
    """Grid-row r's cell from the base hash: pairwise-independent
    affine family mod p, then mod width. a_r*max_h31 < 2^62 fits
    int64."""
    a, b = _row_consts(r)
    return ((a * h31 + b) % _P % width).cast("int")


def _cells_from_h(h31: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cell(h31, r, width).alias("cell"))
            for r in range(depth)
        ]
    )


def h31_sql(key_sql: str) -> str:
    """DuckDB SQL mirroring :func:`_h31`."""
    return f"({oracle_hash64(key_sql, seed=0)} % {_P})"


def cell_sql(h_sql: str, r: int, width: int) -> str:
    """DuckDB SQL mirroring :func:`_cell`."""
    a, b = _row_consts(r)
    return f"CAST((({a} * {h_sql} + {b}) % {_P}) % {width} AS INT)"


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (r, cell, c) with depth*width rows at most."""
    return (
        # separate projection so the md5 base hash is computed ONCE per
        # row (CollapseProject keeps non-cheap multiply-referenced
        # aliases in their own stage)
        df.select(_h31(F.col(key_col)).alias("_h"))
        .select(F.explode(_cells_from_h(F.col("_h"), depth, width)).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """CMS point-frequency estimates for a bounded probe-key set — the
    canonical sketch workload: the sketch summarizes an unbounded
    stream/corpus, point queries answer from the 256-cell grid without
    ever re-scanning it.

    Returns (key, est_count); est_count >= true count by construction
    (collisions only inflate). ``probes`` is one key per row.
    """
    sketch = cms_build(df, key_col, depth, width)
    return estimates_from_sketch(sketch, probes, key_col, depth, width)


def estimates_from_sketch(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point estimates for probe keys against an EXISTING sketch (built
    here, loaded from a store, or merged from streaming partials)."""
    cells = (
        probes.select(key_col, _h31(F.col(key_col)).alias("_h"))
        .select(
            key_col, F.explode(_cells_from_h(F.col("_h"), depth, width)).alias("rc")
        )
        .select(key_col, F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
    )
    return (
        cells.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    min_share: float = 0.01,
) -> DataFrame:
    """Keys whose CMS frequency estimate is >= min_share of all rows.

    Returns (key, est_count) — est_count >= true count by construction.
    The candidate set is the distinct keys (in a real pipeline the
    candidates are given, e.g. yesterday's heavy hitters); the sketch
    side of the probe join is depth*width rows, broadcast.
    """
    sketch = cms_build(df, key_col, depth, width)
    # total rows fall out of the sketch itself (every input row lands in
    # exactly one cell per grid row, so sum(c) == N * depth) — no extra
    # raw-data scan, and the identical sketch subtree is exchange-reused
    # between this branch and the probe join.
    total = sketch.groupBy().agg(
        (F.sum("c").cast("double") / F.lit(float(depth))).alias("_total")
    )
    probes = (
        df.select(key_col)
        .distinct()
        .select(key_col, _h31(F.col(key_col)).alias("_h"))
        .select(
            key_col, F.explode(_cells_from_h(F.col("_h"), depth, width)).alias("rc")
        )
        .select(key_col, F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(
            F.col("est_count").cast("double")
            >= F.col("_total") * F.lit(float(min_share))
        )
        .select(key_col, F.col("est_count").cast("long").alias("est_count"))
    )


def cms_join_size(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Equi-join cardinality estimate from the two sides' sketches:
    est = min over grid rows r of sum_cell cA[r,cell] * cB[r,cell]
    (the CM inner-product estimator; >= the true join size, collisions
    only inflate). Returns a single row (est_join_size).

    This is what a query planner does with sketches: size a join
    WITHOUT scanning either table again — both sketches are <=
    depth*width rows however big the inputs, and stay mergeable across
    shards/days.
    """
    a = cms_build(left, left_key, depth, width)
    b = cms_build(right, right_key, depth, width)
    per_row = (
        a.join(b.withColumnRenamed("c", "c2"), ["r", "cell"])
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("ip"))
    )
    return per_row.groupBy().agg(
        F.min("ip").cast("long").alias("est_join_size")
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Mergeable approximate quantiles from an equi-width histogram:
    one min/max/count pass, one combinable per-bin count, linear
    interpolation inside the target bin. Error <= one bin width by
    construction (the true quantile lies in the chosen bin).

    Why not percentile_approx: its GK sketch is
    not reproducible across engines; this histogram is a deterministic
    fixed sequence of double ops the DuckDB oracle replays bit-for-bit,
    and per-shard histograms merge by bin-wise addition (same property
    CMS/HLL give counts/distincts).

    The cumulative sum runs as a triangular join over the <= ``bins``-row
    histogram (broadcast, bounded) — no single-partition window.

    Returns (q, est_value), one row per requested quantile.
    """
    v = F.col(value_col)
    b = df.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    )
    binned = df.crossJoin(F.broadcast(b)).select(
        # hi == lo guard (constant column): the affine bin expression
        # would be 0/0 = NaN -> null bin; route every row to bin 0
        # instead, where binw = 0 makes the interpolation collapse to
        # the exact answer lo (ADVICE r3). Empty input yields an empty
        # result by construction (no rows to bin).
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(((v - F.col("lo")) / (F.col("hi") - F.col("lo"))) * bins)
                .cast("int"),
                F.lit(bins - 1),
            )
        )
        .alias("bin"),
        "lo",
        "hi",
        "n",
    )
    hist = binned.groupBy("bin", "lo", "hi", "n").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    hb = hist.select(F.col("bin").alias("bin2"), F.col("cnt").alias("cnt2"))
    cum = (
        hist.join(F.broadcast(hb), F.col("bin2") <= F.col("bin"))
        .groupBy("bin", "lo", "hi", "n", "cnt")
        .agg(F.sum("cnt2").alias("cum"))
    )
    targets = (
        b.select(
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            F.col("n"),
        ).select(
            "q", F.ceil(F.col("q") * F.col("n").cast("double")).cast("double")
            .alias("target")
        )
    )
    cand = cum.join(
        F.broadcast(targets), F.col("cum").cast("double") >= F.col("target")
    )
    chosen = cand.groupBy("q", "target").agg(F.min("bin").alias("bin"))
    sel = chosen.join(F.broadcast(cum), "bin")
    binw = (F.col("hi") - F.col("lo")) / bins
    est = (
        F.col("lo")
        + F.col("bin") * binw
        + binw
        * (
            (F.col("target") - (F.col("cum") - F.col("cnt")).cast("double"))
            / F.col("cnt").cast("double")
        )
    )
    return sel.select("q", est.alias("est_value"))


# ---------------------------------------------------------------------------
# Portable HyperLogLog: md5-register distinct-count sketch that DuckDB
# replays bit-for-bit (the oracle-checkable twin of the DataSketches
# HLL in queries/sql_json.py, which is rows-only because its register
# layout is implementation-private).
#
# Shape at 100 TB: register table = groupBy (group, idx) max(rho) —
# partial-aggregated map-side, <= 2^p rows per group out of the
# shuffle regardless of input size; merging corpora/groups is another
# max over the same bounded table (demonstrated by the global row of
# customer_hll_portable). The estimate is EXACT integer arithmetic
# until one final double multiply/divide: S = sum_j 2^(RHO_CAP - M_j)
# fits int64 by construction (2^54 * 256 = 2^62), is
# order-independent, and both engines evaluate the same left-to-right
# double expression for alpha*m^2*2^RHO_CAP/S.
#
# rho uses TRAILING zeros of the 52-bit hash suffix (+1) instead of
# the textbook leading zeros: same geometric distribution
# (P(rho>=r) = 2^-(r-1)), but computable with pure integer modulo
# tests — no log2/floating point whose last-ulp rounding could differ
# across engines.

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_RHO_CAP = 54  # 52-bit suffix: trailing-zeros+1 <= 53; w=0 -> 54
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_SEED = 11


def hll_register_table(
    df: DataFrame, key: str | Column, group_cols: list[str]
) -> DataFrame:
    """Max-rho register table: (group..., idx int, M int), <= 256 rows
    per group. Mergeable: ``groupBy(idx).agg(max(M))`` over any union
    of register tables is the sketch of the union of their inputs."""
    col = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(col, seed=HLL_SEED)  # 60-bit, non-negative
    w = F.expr(f"_h DIV {HLL_M}")
    rho = F.expr(
        "size(filter(sequence(1, 53), "
        "t -> _w % shiftleft(CAST(1 AS BIGINT), t) = 0)) + 1"
    )
    return (
        df.select(*group_cols, h.alias("_h"))
        .withColumn("idx", F.pmod(F.col("_h"), F.lit(HLL_M)).cast("int"))
        .withColumn("_w", w)
        .withColumn("_rho", rho)
        .groupBy(*group_cols, "idx")
        .agg(F.max("_rho").cast("int").alias("M"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from a register table: (group...,
    n_est double, n_zero_regs int). Absent registers contribute
    2^RHO_CAP (M=0). ``n_zero_regs`` is the exact empty-register count
    the caller needs for the small-range linear-counting correction
    (est = m*ln(m/V) when n < ~2.5m) — the correction stays
    caller-side because ln's last-ulp rounding is not bit-portable
    across engines, while everything emitted here is."""
    s = regs.groupBy(*group_cols).agg(
        (
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - M)")
            )
            + (HLL_M - F.count(F.lit(1)))
            * F.lit(1 << HLL_RHO_CAP).cast("long")
        ).alias("S"),
        (HLL_M - F.count(F.lit(1))).cast("int").alias("n_zero_regs"),
    )
    est = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << HLL_RHO_CAP))
        / F.col("S").cast("double")
    )
    return s.select(*group_cols, est.alias("n_est"), "n_zero_regs")


def hll_oracle_cte(table: str, key: str, group: str, prefix: str = "") -> str:
    """DuckDB CTE text replaying the register table: yields relation
    ``{prefix}hllm({group}, idx, M)``. ``table`` may be any relation
    text (a prior CTE name works); ``prefix`` disambiguates multiple
    sketches in one statement."""
    h = oracle_hash64(key, seed=HLL_SEED)
    return f"""
    {prefix}hllh AS (SELECT {group}, {h} AS h FROM {table}),
    {prefix}hllr AS (SELECT {group}, h % {HLL_M} AS idx,
                    len(list_filter(range(1, 54),
                        t -> ((h // {HLL_M}) % (1::BIGINT << t)) = 0)) + 1 AS rho
             FROM {prefix}hllh),
    {prefix}hllm AS (SELECT {group}, idx, MAX(rho) AS M FROM {prefix}hllr GROUP BY 1, 2)
    """


def hll_oracle_estimate(rel: str, group: str | None = None) -> str:
    """DuckDB SELECT text over a register relation (group?, idx, M)
    mirroring :func:`hll_estimate` (identical left-to-right double
    expression). ``group=None`` emits the global (ungrouped) form."""
    # literals are cast to DOUBLE explicitly: DuckDB parses bare float
    # literals as DECIMAL and overflows multiplying them
    est = (
        f"CAST({HLL_ALPHA!r} AS DOUBLE)"
        f" * CAST({float(HLL_M * HLL_M)!r} AS DOUBLE)"
        f" * CAST({float(1 << HLL_RHO_CAP)!r} AS DOUBLE)"
        f" / CAST(CAST(SUM(1::BIGINT << ({HLL_RHO_CAP} - M)) AS BIGINT)"
        f" + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_RHO_CAP})"
        f" AS DOUBLE) AS n_est,"
        f" CAST({HLL_M} - COUNT(*) AS INT) AS n_zero_regs"
    )
    if group is None:
        return f"SELECT {est} FROM {rel}"
    return f"SELECT {group}, {est} FROM {rel} GROUP BY {group}"
