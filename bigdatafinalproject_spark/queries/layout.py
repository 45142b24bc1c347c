"""Multi-dimensional clustering (Z-order) queries.

The physical payoff — parquet footer min/max pruning of 2-D range
predicates — is asserted in tests/test_layout_zorder.py; the query
here pins the Morton transform itself (bit-interleave + max-scaling
parity with the DuckDB oracle) and shows the clustering effect as
per-z-bucket bounding rectangles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.layout import (
    scale_to_bits,
    zvalue,
    zvalue_sql,
)
from bigdatafinalproject_spark.registry import query

_BITS = 8  # both keys max-scaled onto a 256x256 grid
_BUCKET_SHIFT = 8  # 256 z-buckets of 16x16 grid cells


@query(
    "lineitem_zorder_buckets",
    oracle=f"""
    WITH m AS (SELECT MAX(l_partkey) AS mx, MAX(l_suppkey) AS my FROM lineitem),
    z AS (
      SELECT {zvalue_sql(
          "((CAST(l_partkey AS BIGINT) * 256) // (CAST(mx AS BIGINT) + 1))",
          "((CAST(l_suppkey AS BIGINT) * 256) // (CAST(my AS BIGINT) + 1))",
          _BITS,
      )} >> {_BUCKET_SHIFT} AS z_bucket,
             l_partkey, l_suppkey
      FROM lineitem, m)
    SELECT CAST(z_bucket AS BIGINT) AS z_bucket,
           COUNT(*) AS n,
           CAST(MIN(l_partkey) AS BIGINT) AS part_lo,
           CAST(MAX(l_partkey) AS BIGINT) AS part_hi,
           CAST(MIN(l_suppkey) AS BIGINT) AS supp_lo,
           CAST(MAX(l_suppkey) AS BIGINT) AS supp_hi
    FROM z GROUP BY z_bucket
    """,
)
def lineitem_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order bucket profile of lineitem on (l_partkey, l_suppkey):
    both keys max-scaled to 8 bits (equal weight — see
    operators/layout.scale_to_bits for why that is load-bearing), then
    Morton-interleaved; every bucket (a contiguous z-range) bounds a
    small rectangle of the 2-D key space — the property that makes
    min/max file stats prune range predicates on EITHER key after a
    z-ordered write (operators/layout.zorder_write). The max() scalars
    ride in on a broadcast join; everything else is per-row bit
    arithmetic + one hash aggregate: shuffle-light at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my"))
    z = zvalue(
        F.expr(scale_to_bits("l_partkey", "mx", _BITS)),
        F.expr(scale_to_bits("l_suppkey", "my", _BITS)),
        _BITS,
    )
    return (
        li.crossJoin(F.broadcast(m))
        .select(
            F.shiftrightunsigned(z, _BUCKET_SHIFT).alias("z_bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )
