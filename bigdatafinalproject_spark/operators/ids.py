"""Dense surrogate-key assignment (SURVEY §7.3, fixing §4.3-1).

The reference built user/item integer ids with ``row_number()`` over a
GLOBAL unpartitioned window (reference: ALS_model3.py:75-87) — Spark
collapses that to a single task, which is fatal at scale.

Same contract here — ids are dense (0..N-1), 0-based, deterministic,
ordered by the natural key — but computed with ONE shuffle and no
single-task stage (the distributed ``zipWithIndex`` pattern, pure
DataFrame):

1. range-partition the distinct keys and sort within partitions, so
   global order == (partition id, position within partition);
2. ``monotonically_increasing_id()`` encodes exactly that pair
   (partition id in the upper 31 bits, row position in the lower 33)
   as a narrow, shuffle-free projection;
3. per-partition row counts (a #partitions-sized aggregate) give
   exclusive prefix offsets; broadcast-join them back and
   ``id = offset[pid] + position``.

The result is invariant to the partition count because the id depends
only on global key order, not on where range boundaries fall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.barrier import materialize_barrier

_LOW33 = (1 << 33) - 1


def dense_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "id",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Map distinct non-null ``key_col`` values to dense ids 0..N-1 in
    natural-key order. Returns ``(key_col, id_col int)``.

    Equivalent SQL (the oracle): ``row_number() OVER (ORDER BY key) - 1``
    over the distinct keys — but executed without a global window.

    ``checkpoint_dir``: optional fault-tolerant directory for a
    reliable checkpoint barrier instead of localCheckpoint (survives
    executor loss on real clusters; operators/barrier.py).
    """
    keys = df.select(key_col).na.drop().distinct()
    if num_partitions:
        keys = keys.repartitionByRange(num_partitions, F.col(key_col))
    else:
        keys = keys.repartitionByRange(F.col(key_col))
    keys = keys.sortWithinPartitions(key_col)

    # CRITICAL: freeze this exact partitioning. repartitionByRange picks
    # boundaries by SAMPLING, re-seeded per evaluation — the offsets
    # aggregate below and the final join would otherwise each re-evaluate
    # the range exchange and can see DIFFERENT partitionings (observed:
    # an upstream .cache() broke exchange reuse and the pid join silently
    # dropped most rows). The barrier materializes the distinct-key
    # set (bounded size) once; every branch reads that single evaluation.
    keys = materialize_barrier(keys, checkpoint_dir=checkpoint_dir)

    encoded = keys.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_pid", F.shiftrightunsigned("_mid", 33)
    )

    # One row per partition; the window here runs over #partitions rows,
    # not data rows — deliberately tiny, then broadcast back.
    offsets = (
        encoded.groupBy("_pid")
        .count()
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("count").over(W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )

    # long, not int: at the 100 TB design point distinct keys can exceed
    # 2^31-1 and an int cast would silently wrap. The one consumer that
    # genuinely needs int ids (MLlib ALS) casts at its own boundary,
    # where the cardinality bound is its requirement, not ours.
    return encoded.join(F.broadcast(offsets), on="_pid").select(
        F.col(key_col),
        (F.col("_offset") + (F.col("_mid").bitwiseAND(F.lit(_LOW33)))).cast("long").alias(id_col),
    )


def with_surrogate_key(
    df: DataFrame,
    mapping: DataFrame,
    key_col: str,
) -> DataFrame:
    """Join a fact table back to its surrogate mapping (the reference's
    join-back at ALS_model3.py:205-208); broadcast decision is left to
    Catalyst/AQE (mappings are usually dimension-sized)."""
    return df.join(mapping, on=key_col, how="inner")
