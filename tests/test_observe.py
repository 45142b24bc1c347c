"""``DataFrame.observe`` / ``Observation`` — the production-pipeline
metrics hook (C4 plumbing family): named aggregates computed DURING a
job's single pass, no second scan. The reference's check.py-style
validation re-reads the data; observe() attaches the counters to the
plan so a 100 TB write gets its row counts and quality tallies for
free.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_observe_metrics_match_direct_aggregate(spark):
    o = load_table(spark, SF_DIR, "orders")
    obs = Observation("orders_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive"
        ),
        F.max("o_totalprice").alias("max_price"),
    )
    # one real action drives both the pipeline and the metrics
    kept = observed.filter(F.col("o_orderstatus") == "F").count()
    got = obs.get
    direct = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive"
        ),
        F.max("o_totalprice").alias("max_price"),
    ).collect()[0]
    assert got["n_rows"] == direct.n_rows
    assert got["nonpositive"] == direct.nonpositive
    assert got["max_price"] == direct.max_price
    # the observed metrics cover the FULL input, not the filtered output
    assert kept <= got["n_rows"]
