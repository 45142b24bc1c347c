"""Count-min-sketch frequency estimation (net-new sketch surface;
pairs with the mergeable HLL distinct sketches in queries/sql_json.py).

The DuckDB oracle replays the identical (depth x width) counter grid —
same md5-derived base hash, same affine row family, same min-over-rows
estimate — so the frequency ESTIMATES (not just a thresholded set)
hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.sketches import (
    cell_sql,
    cms_estimates,
    h31_sql,
)
from bigdatafinalproject_spark.registry import query

_DEPTH, _WIDTH = 4, 64
_PROBE_MOD = 97  # probe set: user_id % 97 == 0 — bounded, deterministic


def _cms_oracle(table: str, key: str) -> str:
    cells = "\n      UNION ALL ".join(
        f"SELECT {r} AS r, {cell_sql('h', r, _WIDTH)} AS cell FROM hashed"
        for r in range(_DEPTH)
    )
    probes = "\n      UNION ALL ".join(
        f"SELECT {key}, {r} AS r, {cell_sql('h', r, _WIDTH)} AS cell FROM khashed"
        for r in range(_DEPTH)
    )
    return f"""
    WITH hashed AS (SELECT {h31_sql(key)} AS h FROM {table}),
    cells AS ({cells}),
    sketch AS (SELECT r, cell, COUNT(*) AS c FROM cells GROUP BY r, cell),
    keys AS (SELECT DISTINCT {key} FROM {table}
             WHERE {key} % {_PROBE_MOD} = 0),
    khashed AS (SELECT {key}, {h31_sql(key)} AS h FROM keys),
    probes AS ({probes})
    SELECT {key}, CAST(MIN(c) AS BIGINT) AS est_count
    FROM probes JOIN sketch USING (r, cell) GROUP BY {key}
    """


@query("cms_user_frequency", oracle=_cms_oracle("events", "user_id"))
def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS event-count estimates for a probe panel of users.

    The sketch is built once over the full event stream (one (r, cell)
    groupBy: <= 256 shuffled rows per partition regardless of input
    size; mergeable across shards/days by cell-wise addition); point
    queries for the probe panel answer from the broadcast 256-cell grid
    with no second scan of the events. est_count >= true count by
    construction — the oracle proves the exact estimates, collisions
    included.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    probes = ev.filter(F.col("user_id") % _PROBE_MOD == 0).distinct()
    return cms_estimates(ev, "user_id", probes, depth=_DEPTH, width=_WIDTH)
