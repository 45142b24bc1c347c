"""Runtime-filter surface: explicit Bloom-filter join pruning.

The engine already relies on Spark's own injected runtime filters
(tests/test_runtime_filters.py); this module registers the EXPLICIT
operator (operators/bloom.py) — the form a pipeline uses where the
optimizer can't help: ahead of a Python/Arrow stage, inside a
streaming micro-batch, or persisted across jobs.

Oracle strategy: a Bloom filter has no false negatives, so
prune -> exact-join ≡ plain join, row for row. The DuckDB oracle runs
the PLAIN join — equality of results is precisely the soundness
theorem for the filter. Effectiveness (rows actually pruned, false-
positive rate near the textbook bound) is pinned in
tests/test_bloom.py, where the bloom internals are also replayed
against an independent pure-Python reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import dsum
from bigdatafinalproject_spark.registry import query


@query(
    "bloom_prune_join",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size = 15
    GROUP BY p_brand
    """,
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by brand for size-15 parts, with the fact side pruned by
    an explicit Bloom filter built from the dimension BEFORE the join
    shuffle. The oracle is the plain join: bloom soundness (zero false
    negatives) makes the two plans row-identical, so a hash match here
    is a proof the filter never drops a real match. At 100 TB the
    pruned rows never enter the join exchange — shuffle volume falls by
    the dimension's selectivity while the bloom itself stays a
    broadcast-able <= m/32-row aggregate regardless of corpus size."""
    from bigdatafinalproject_spark.operators.bloom import bloom_prune

    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prune(li, "l_partkey", p, "p_partkey", m_bits=8192, k=4)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pruned.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )
