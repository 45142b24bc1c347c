"""As-of (point-in-time) join — an operator Spark lacks natively
(net-new surface; listed absent in the reference too, SURVEY §2.3).

Implemented as the scalable union-merge plan (composition of built-in
ops, per the preference order in the PySpark guide):

1. union left (probe) and right (reference) rows tagged by side, with
   right rows sorting BEFORE probe rows at equal timestamps (so
   "at-or-before" includes same-instant matches);
2. one window per key ordered by (ts, side, tiebreak):
   ``last_value(right_payload) IGNORE NULLS`` carries the most recent
   right row forward;
3. keep probe rows.

Cost: ONE shuffle (by key) + one sort — same as a single window, never
a range cross-product. Ties among right rows at the same ts resolve to
the greatest tiebreak value (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` for the same key ``on`` (ties on
    right_ts resolved by greatest ``tiebreak``). Left rows with no
    earlier right row keep null payloads.

    Returns left's columns + payload_cols.
    """
    # Equality-join semantics: a NULL key matches nothing. The window
    # below would otherwise group NULL-key probe and build rows together
    # (partitionBy puts NULLs in one partition) and hand out matches SQL
    # would not. Dropping NULL-key build rows restores it: NULL-key
    # probe rows then sit in a partition with no payloads -> NULL.
    right = right.filter(F.col(on).isNotNull())

    l_cols = left.columns
    probe = left.select(
        *l_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
    )
    build = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(tiebreak).alias("_tb"),
    ).select(*probe.columns)  # align column order

    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = build.unionByName(probe).select(
        *l_cols,
        "_side",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
