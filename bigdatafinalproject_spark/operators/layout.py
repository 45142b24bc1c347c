"""Partition-layout helpers.

``spread``: compressed text/embedding parquet under-splits — a
byte-sized scan partition can hold a compute-heavy operator's worth of
rows (locally a whole table is often ONE split, so one task does every
shingle/dot-product). When the input has fewer partitions than the
cluster has cores, hash-spread it by key first; when the input is
already wide (the 100 TB case) this is a no-op, so operators can call
it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin(df: DataFrame, *key_cols: str | Column) -> DataFrame:
    """Explicitly hash-partition ``df`` by ``key_cols`` across
    ``defaultParallelism``.

    For a frame about to feed a window/groupBy keyed on the same
    columns this is SHUFFLE-NEUTRAL: the explicit exchange satisfies
    the operator's clustered-distribution requirement, so it replaces
    (not precedes) the exchange the operator would have inserted. The
    difference is that a user-specified partition count is exempt from
    AQE's byte-based coalescing — which otherwise shrinks byte-light
    but row- or compute-heavy inputs (compressed facts, pair keys) to
    a handful of tasks. Unlike ``spread`` this works on shuffle-fed
    frames, where the pre-AQE partition count is useless as a signal.
    """
    sc = df.sparkSession.sparkContext
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return df.repartition(sc.defaultParallelism, *cols)


def spread(df: DataFrame, *key_cols: str | Column) -> DataFrame:
    """Repartition ``df`` across ``defaultParallelism`` by ``key_cols``
    iff it currently has fewer partitions than that (see module doc).
    The explicit partition count keeps AQE from byte-coalescing the
    exchange back to one task."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        return df.repartition(sc.defaultParallelism, *cols)
    return df
