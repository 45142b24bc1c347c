"""running_sum (distributed prefix sums) and materialize_barrier
(local vs reliable checkpoint) — correctness, partition invariance,
and cluster-durable-mode equivalence."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.cumsum import running_sum
from bigdatafinalproject_spark.operators.ids import dense_ids


def _expected_cumsum(spark, df):
    """Single-task global window — the semantics being replaced; fine
    as a test oracle on tiny data."""
    w = W.orderBy(F.col("v").desc(), "k").rowsBetween(W.unboundedPreceding, 0)
    return {
        r["k"]: r["c"]
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }


def test_running_sum_matches_global_window(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.pmod(F.col("id") * 37, F.lit(101)).cast("decimal(38,6)")).alias("v"),
    )
    expected = _expected_cumsum(spark, df)
    got = {
        r["k"]: r["running_sum"]
        for r in running_sum(
            df, "v", order_by=[F.col("v").desc(), F.col("k")]
        ).collect()
    }
    assert got == expected


def test_running_sum_partition_invariant(spark):
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("decimal(38,6)").alias("v"),
    )
    r4 = running_sum(
        df, "v", order_by=[F.col("v").desc(), F.col("k")], num_partitions=4
    )
    r13 = running_sum(
        df.repartition(5), "v", order_by=[F.col("v").desc(), F.col("k")],
        num_partitions=13,
    )
    rows4 = {(r["k"], r["running_sum"]) for r in r4.collect()}
    rows13 = {(r["k"], r["running_sum"]) for r in r13.collect()}
    assert rows4 == rows13


def test_running_sum_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir switches the barrier to a reliable checkpoint;
    results must be identical to the local default."""
    df = spark.range(200).select(
        F.col("id").alias("k"), F.lit(1).cast("decimal(38,6)").alias("v")
    )
    order = [F.col("v").desc(), F.col("k")]
    local = {(r["k"], r["running_sum"]) for r in running_sum(df, "v", order).collect()}
    durable = {
        (r["k"], r["running_sum"])
        for r in running_sum(
            df, "v", order, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert durable == local
    ckpt = tmp_path / "ckpt"
    assert ckpt.exists() and any(ckpt.iterdir()), "reliable checkpoint not written"


def test_dense_ids_reliable_checkpoint_mode(spark, tmp_path):
    df = spark.range(100).select(
        F.concat(F.lit("k"), F.format_string("%03d", F.col("id"))).alias("key")
    )
    local = {(r["key"], r["id"]) for r in dense_ids(df, "key").collect()}
    durable = {
        (r["key"], r["id"])
        for r in dense_ids(
            df, "key", checkpoint_dir=str(tmp_path / "ckpt2")
        ).collect()
    }
    assert durable == local
    assert sorted(i for _, i in local) == list(range(100))
