"""Source/sink layer (SURVEY §2.1 parity).

The reference's IO surface, Spark-native: parquet primary (S2/S3), CSV
(S5/S6), JSON, and a JDBC passthrough kept for parity with the
reference's SQLite loads (S1) — gated behind driver availability since
this container ships no JDBC drivers.
"""

from bigdatafinalproject_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
)
from bigdatafinalproject_spark.sources.writers import (
    write_csv,
    write_jsonl,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_parquet",
    "write_csv",
    "write_jsonl",
    "write_parquet",
]
