"""Bucketed interval (range) join.

Spark has no native interval-join physical operator for batch: a join
whose condition is only ``fact.ts BETWEEN iv.start AND iv.end`` plans
as BroadcastNestedLoopJoin (small intervals side) or a cartesian
product — O(F×I) comparisons, the classic 100 TB blow-up. The
streaming engine solves this with watermarked interval joins
(streaming/joins.py); this operator is the batch-side equivalent:

1. explode each interval into the fixed-width time bins it covers
   (fanout = interval_length/bin_width + 1, bounded when interval
   lengths are bounded — enforce/document per use);
2. equi-join facts to intervals on (keys..., bin) — a plain shuffled
   hash/sort-merge join on a high-cardinality composite key;
3. re-filter with the exact BETWEEN predicate.

Each fact row lands in exactly one bin, and an interval covers any
bin at most once, so no post-join dedup is needed. The same shape
backs point-in-polygon joins (geohash bins) and IP-range lookups
(prefix bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: tuple[str, ...] = (),
    bin_width_s: int = 1800,
) -> DataFrame:
    """Inner-join each fact row to every interval row containing its
    timestamp (and matching ``keys``), without a nested-loop join.

    ``bin_width_s`` trades interval-side fanout (shorter bins → more
    exploded rows) against join selectivity (longer bins → more
    false candidates for the BETWEEN re-filter); set it near the
    typical interval length.
    """
    bw = bin_width_s * 1_000_000  # micros
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) DIV {bw}"),
                F.expr(f"unix_micros({end_col}) DIV {bw}"),
            )
        ),
    )
    f = facts.withColumn("_bin", F.expr(f"unix_micros({ts_col}) DIV {bw}"))
    joined = f.join(iv, on=[*keys, "_bin"])
    return joined.filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bin")
