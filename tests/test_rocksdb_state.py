"""RocksDB state store — the production backend for large streaming
state (the default HDFS-backed store keeps every key in executor heap;
at 100 TB-scale state RocksDB spills to local disk with changelog
checkpointing). Pins that our stateful queries run unchanged on it and
produce identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafinalproject_spark.streaming.events import tumbling_counts

SF_DIR = "/root/testdata/sf0.001"

_PROVIDER = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_stateful_agg_identical_on_rocksdb_provider(spark):
    default = tumbling_counts(spark, SF_DIR)
    baseline = sorted(map(tuple, default.collect()))

    prev = spark.conf.get(_PROVIDER, None)
    spark.conf.set(_PROVIDER, _ROCKSDB)
    try:
        got = sorted(map(tuple, tumbling_counts(spark, SF_DIR).collect()))
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER)
        else:
            spark.conf.set(_PROVIDER, prev)
    assert got == baseline
    assert len(got) > 0
