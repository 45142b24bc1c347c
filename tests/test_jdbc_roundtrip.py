"""S1 JDBC executed path (reference ALS_model3.py:67-73 read sqlite
over JDBC; Derby embedded is on Spark's default classpath and goes
through the same JdbcRelationProvider)."""

from __future__ import annotations

import pytest

from bigdatafinalproject_spark.queries.jdbc import DERBY_DRIVER, _derby_url
from bigdatafinalproject_spark.sources.readers import read_jdbc
from bigdatafinalproject_spark.sources.writers import write_jdbc

SF_DIR = "/root/testdata/sf0.001"


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(100).selectExpr(
        "id", "cast(id % 7 as int) as grp", "cast(id * 1.5 as double) as v"
    )
    write_jdbc(df, url, "t_rt", driver=DERBY_DRIVER, mode="overwrite")
    back = read_jdbc(spark, url, "t_rt", driver=DERBY_DRIVER)
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_jdbc_partitioned_scan_parallelizes(spark, tmp_path):
    """The scale path: partitionColumn splits the scan into N JDBC
    partitions (one connection each) — verify partition count AND that
    the union over stride predicates is lossless."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    df = spark.range(1000).selectExpr("id", "cast(id as double) as v")
    write_jdbc(df, url, "t_part", driver=DERBY_DRIVER, mode="overwrite")
    back = read_jdbc(
        spark,
        url,
        "t_part",
        driver=DERBY_DRIVER,
        partitionColumn="id",
        lowerBound="0",
        upperBound="1000",
        numPartitions="8",
    )
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000


def test_jdbc_missing_driver_is_clear_error(spark):
    with pytest.raises(RuntimeError, match="JDBC load failed"):
        read_jdbc(
            spark,
            "jdbc:sqlite:/tmp/nonexistent.db",
            "t",
            driver="org.sqlite.JDBC",
        ).count()


def test_jdbc_registry_query_matches_source_agg(spark):
    """jdbc_roundtrip_agg's JDBC hop is lossless: aggregate over the
    Derby readback equals the same aggregate over the source parquet."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.functions import dsum
    from bigdatafinalproject_spark.registry import QUERIES

    got = {
        r.c_nationkey: (r.n_cust, r.total_acctbal)
        for r in QUERIES["jdbc_roundtrip_agg"](spark, SF_DIR).collect()
    }
    want = {
        r.c_nationkey: (r.n_cust, r.total_acctbal)
        for r in (
            load_table(spark, SF_DIR, "customer")
            .groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
            .agg(
                F.count(F.lit(1)).alias("n_cust"),
                dsum(F.col("c_acctbal")).alias("total_acctbal"),
            )
            .collect()
        )
    }
    assert got == want


def test_derby_url_is_process_scoped():
    assert _derby_url(SF_DIR) == _derby_url(SF_DIR)
    assert _derby_url(SF_DIR) != _derby_url("/root/testdata/sf0.01")
