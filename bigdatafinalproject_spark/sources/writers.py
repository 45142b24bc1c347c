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
