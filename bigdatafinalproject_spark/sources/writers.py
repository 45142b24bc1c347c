"""Writers (SURVEY §2.1: S3 parquet, S5 csv).

The reference wrote final CSVs from pandas on the driver
(recommendations3.py:177,195) — these are the distributed equivalents.
``single_file`` exists for small deliverables only; it coalesces to one
task and must never be used for big outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def compact_small_files(
    spark, path: str, target_rows_per_file: int, out_path: str | None = None
) -> int:
    """Compact a parquet directory's small files (the classic many-tiny-
    files problem a long-running ingest leaves behind; at 100 TB it
    turns every scan's task scheduling into the bottleneck).

    Rewrites to ceil(total_rows / target_rows_per_file) files and
    returns that file count. Row-count-based sizing keeps this
    dependency-free; a production variant would size on bytes. Writes
    to ``out_path`` (or replaces ``path`` via a temp-swap when omitted —
    here kept side-by-side to stay crash-safe without a transactional
    table format).
    """
    import math

    df = spark.read.parquet(path)
    total = df.count()
    n_files = max(1, math.ceil(total / target_rows_per_file))
    dest = out_path or (path.rstrip("/") + "_compacted")
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """JDBC table sink — the write half of the reference's JDBC surface
    (reference ALS_model3.py:67-73 reads sqlite over JDBC; Spark's JDBC
    code path is database-agnostic). Each partition opens its own
    connection and batches inserts; pass batchsize/numPartitions through
    ``options`` to tune (coalesce first for databases that dislike many
    concurrent writers)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    try:
        w.mode(mode).save()
    except Exception as e:  # pragma: no cover - driver-dependent
        raise RuntimeError(
            f"JDBC write failed for {url!r} table {table!r} — is the driver "
            f"jar on the classpath? ({e})"
        ) from e


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSON-lines sink — the interchange format tokenizer/training
    pipelines ingest. Spark's json writer emits one object per line per
    partition file (already JSONL); pass compression='gzip' for the
    common .jsonl.gz layout. Distributed write, never a driver
    collect."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
