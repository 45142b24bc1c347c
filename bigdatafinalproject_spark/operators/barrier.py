"""Materialization barriers for iterative / order-sensitive plans.

Two operators need to freeze an evaluation: dense_ids / running_sum
(a repartitionByRange whose sampled boundaries must be read by two
branches of the same plan) and connected_components (iterative lineage
growth). Locally, ``localCheckpoint(eager=True)`` is the right tool —
but it stores blocks on executors, so on a real cluster an executor
loss makes the lineage unrecoverable mid-job.

``materialize_barrier`` keeps the local default and adds a
cluster-durable mode: a *reliable* ``checkpoint()`` into a fault-
tolerant directory (HDFS/S3 on a cluster). A parquet write/read would
NOT work here: the parquet reader assigns files to partitions by size
order, destroying the partition-index == range-order invariant that
dense_ids and running_sum depend on. Reliable RDD checkpoints preserve
the partitioning exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_barrier(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` once and cut its lineage, preserving the
    exact partition structure.

    checkpoint_dir=None (default): eager localCheckpoint — fastest,
    executor-block storage, the right choice on local[*] and for
    short-lived jobs.

    checkpoint_dir=<fault-tolerant path>: eager reliable checkpoint —
    survives executor loss; use for long iterative jobs on real
    clusters. The directory is set lazily and only if the session has
    none yet (a session-global setting in Spark).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
