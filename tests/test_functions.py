"""Portable-hash helper properties (hypothesis-driven where cheap)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import (
    bucket,
    oracle_bucket,
    oracle_hash64,
    portable_hash64,
)


@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    seed=st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=10, deadline=None)
def test_hash_matches_duckdb(spark, vals, seed):
    """portable_hash64 == its documented DuckDB formula for arbitrary
    strings and seeds (the contract every split/dedup oracle rests on)."""
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["v"]: r["h"]
        for r in df.select("v", portable_hash64("v", seed=seed).alias("h")).collect()
    }
    con = duckdb.connect()
    sql = f"SELECT {oracle_hash64('?', seed)}"
    for v in vals:
        expected = con.execute(sql, [v]).fetchone()[0]
        assert got[v] == expected, (v, seed)
    con.close()


def test_bucket_range_and_distribution(spark):
    """Buckets stay in [0, k) and are reasonably spread."""
    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    k = 8
    counts = {
        r["b"]: r["count"]
        for r in df.select(bucket("v", k=k, seed=3).alias("b")).groupBy("b").count().collect()
    }
    assert set(counts) <= set(range(k))
    assert min(counts.values()) > 5000 / k * 0.7, "bucket skew too high"


def test_oracle_bucket_matches(spark):
    df = spark.range(0, 500).select(F.col("id").cast("string").alias("v"))
    got = sorted(
        map(tuple, df.select("v", bucket("v", k=5, seed=9).alias("b")).collect())
    )
    con = duckdb.connect()
    exp = sorted(
        con.execute(
            f"SELECT CAST(range AS VARCHAR) AS v, {oracle_bucket('CAST(range AS VARCHAR)', 5, 9)} AS b "
            "FROM range(0, 500)"
        ).fetchall()
    )
    con.close()
    assert got == exp


def test_hll_union_estimate_bound(spark):
    """HLL lgConfigK=12 has ~1.6% relative standard error; assert every
    per-nation estimate AND the union-merged global estimate land
    within 5% of exact (loose 3-sigma-ish bound, deterministic data)."""
    from bigdatafinalproject_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["customer_hll_distinct"](spark, SF_DIR).collect()
    assert any(r.c_nationkey == -1 for r in rows), "global union row missing"
    for r in rows:
        assert abs(r.n_est - r.n_exact) <= max(1, 0.05 * r.n_exact), r
