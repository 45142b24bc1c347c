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

All hashing is md5-derived (functions.bucket) so the DuckDB oracle
replays the identical grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import bucket


def _cells(key: Column, depth: int, width: int) -> Column:
    """Array of (r, cell) structs for one key — row r uses seed r."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), bucket(key, k=width, seed=r).alias("cell")
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (r, cell, c) with depth*width rows at most."""
    return (
        df.select(F.explode(_cells(F.col(key_col), depth, width)).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
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
    # total row count falls out of the sketch itself (each input row
    # increments exactly one cell per grid row, so row 0 sums to N) —
    # no extra scan, and the identical sketch subtree lets Spark reuse
    # the exchange between the probe join and this branch.
    total = (
        sketch.filter(F.col("r") == 0)
        .groupBy()
        .agg(F.sum("c").alias("_total"))
    )
    probes = (
        df.select(key_col)
        .distinct()
        .select(key_col, F.explode(_cells(F.col(key_col), depth, width)).alias("rc"))
        .select(key_col, F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_count").cast("double") >= F.col("_total") * min_share)
        .select(key_col, F.col("est_count").cast("long").alias("est_count"))
    )
