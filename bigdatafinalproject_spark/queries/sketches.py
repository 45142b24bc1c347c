"""Count-min-sketch heavy hitters (net-new sketch surface; pairs with
the mergeable HLL distinct sketches in queries/sql_json.py).

The DuckDB oracle replays the identical (depth x width) counter grid —
same md5-derived row hashes, same min-over-rows estimate — so the
frequency ESTIMATES (not just the heavy-hitter set) hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import oracle_bucket
from bigdatafinalproject_spark.operators.sketches import cms_heavy_hitters
from bigdatafinalproject_spark.registry import query

_DEPTH, _WIDTH, _SHARE = 4, 64, 0.01


def _cms_oracle(table: str, key: str) -> str:
    cells = "\n      UNION ALL ".join(
        f"SELECT {r} AS r, {oracle_bucket(key, _WIDTH, seed=r)} AS cell FROM {table}"
        for r in range(_DEPTH)
    )
    probes = "\n      UNION ALL ".join(
        f"SELECT {key}, {r} AS r, {oracle_bucket(key, _WIDTH, seed=r)} AS cell"
        f" FROM keys"
        for r in range(_DEPTH)
    )
    return f"""
    WITH cells AS ({cells}),
    sketch AS (SELECT r, cell, COUNT(*) AS c FROM cells GROUP BY r, cell),
    keys AS (SELECT DISTINCT {key} FROM {table}),
    probes AS ({probes}),
    est AS (SELECT {key}, MIN(c) AS est_count
            FROM probes JOIN sketch USING (r, cell) GROUP BY {key})
    SELECT {key}, CAST(est_count AS BIGINT) AS est_count
    FROM est
    WHERE CAST(est_count AS DOUBLE) >=
          CAST((SELECT CAST(SUM(c) AS BIGINT) FROM sketch WHERE r = 0) AS DOUBLE)
          * CAST({_SHARE} AS DOUBLE)
    """


@query("cms_heavy_hitters", oracle=_cms_oracle("lineitem", "l_partkey"))
def cms_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose count-min estimate is >= 1% of lineitem rows.

    The estimate is min over 4 rows of a 64-wide counter grid — always
    >= the true count (collisions only inflate), so this is the
    standard no-false-negative heavy-hitter screen. Sketch build is one
    (r, cell) groupBy: <= 256 shuffled rows per partition regardless of
    input size; the probe join broadcasts the 256-row sketch.
    """
    return cms_heavy_hitters(
        load_table(spark, sf_dir, "lineitem").select("l_partkey"),
        "l_partkey",
        depth=_DEPTH,
        width=_WIDTH,
        min_share=_SHARE,
    )
