"""Globally-ordered running (prefix) sums without a single-task window
(SURVEY §4.3-1 applied to cumulative aggregates).

A ``SUM(x) OVER (ORDER BY ...)`` with no PARTITION BY collapses every
row into one task — fine for a 25-row aggregate, fatal when the ordered
set scales with the data (parts, customers, documents). This operator
keeps the exact same semantics with the dense_ids decomposition
(operators/ids.py):

1. range-partition the rows on the ORDER BY keys and sort within
   partitions, so global order == (partition id, position);
2. per-partition running sums via a window PARTITIONED by the range
   partition id (parallel across partitions);
3. per-partition totals (one row per partition) give exclusive prefix
   offsets via a window over #partitions rows — deliberately tiny —
   broadcast back and added.

The range exchange is frozen with an eager localCheckpoint before it
is read by both branches (the repartitionByRange re-sampling landmine,
NOTES.md). Pass ``checkpoint_dir`` for a cluster-durable parquet
barrier instead (executor-loss-safe; see operators/ids.dense_ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.barrier import materialize_barrier


def running_sum(
    df: DataFrame,
    value_col: str,
    order_by: list[Column],
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` in the
    total order given by ``order_by`` (must be a TOTAL order — include a
    unique tiebreaker column, or ties make the result nondeterministic).

    Equivalent SQL: ``SUM(value) OVER (ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW)`` — executed with no stage
    that ever holds more than one range partition in one task.
    """
    if num_partitions:
        rp = df.repartitionByRange(num_partitions, *order_by)
    else:
        rp = df.repartitionByRange(*order_by)
    rp = materialize_barrier(
        rp.sortWithinPartitions(*order_by), checkpoint_dir=checkpoint_dir
    )
    rows = rp.withColumn("_pid", F.spark_partition_id())

    # Parallel per-partition prefix sums: the window partitions on the
    # range-partition id, so each task sorts/sums one range only.
    w_local = W.partitionBy("_pid").orderBy(*order_by).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    local = rows.withColumn("_local", F.sum(value_col).over(w_local))

    # One row per range partition; the ordering window is over
    # #partitions rows, never data rows. Range partition ids ascend in
    # key order, so the exclusive prefix over them is the global offset.
    offsets = (
        rows.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_psum").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0).cast("decimal(38,6)"),
            ),
        )
        .select("_pid", "_offset")
    )

    return (
        local.join(F.broadcast(offsets), on="_pid")
        .withColumn(out_col, F.col("_offset") + F.col("_local"))
        .drop("_pid", "_local", "_offset")
    )
