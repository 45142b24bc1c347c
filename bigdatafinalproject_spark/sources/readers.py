"""Readers (SURVEY §2.1: S1 jdbc, S2 parquet, S6 csv + json).

Schema policy: explicit ``StructType`` everywhere in production paths —
``inferSchema`` is a full extra pass over the data and is only allowed
when the caller opts in (the reference relied on JDBC-declared schemas,
SURVEY §1.3; parquet carries its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """CSV source (reference used driver-side pandas.read_csv,
    model_report.py:35 — here distributed)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """JDBC table scan — parity with the reference's per-script
    ``load_table`` (reference ALS_model3.py:67-73: sqlite over JDBC,
    duplicated in five scripts). No JDBC drivers ship in this
    container, so failures surface as a clear RuntimeError rather than
    a py4j stack.

    At scale, pass partitionColumn/lowerBound/upperBound/numPartitions
    through ``options`` — a single-connection JDBC read is a driver
    bottleneck.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - driver-dependent
        raise RuntimeError(
            f"JDBC load failed for {url!r} table {table!r} — is the driver "
            f"jar on the classpath? ({e})"
        ) from e
