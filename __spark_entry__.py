"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``bigdatafinalproject_spark.registry`` — all queries
and oracle SQL live there, one entry per implemented operator from
SURVEY.md §2 plus the net-new LLM-pipeline operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdatafinalproject_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (popularity top-k) on /root/testdata/sf0.001."""
    return registry.QUERIES["popular_parts"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
