"""Skew-mitigation equivalence + streaming late-data semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.skew import salted_agg, salted_join
from tests.conftest import SF_DIR


def test_salted_agg_equals_plain_agg(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = {
        (r["l_partkey"],): (r["n"], r["qty"])
        for r in li.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"),
        )
        .collect()
    }
    salted = {
        (r["l_partkey"],): (r["n"], r["qty"])
        for r in salted_agg(
            li,
            key_cols=["l_partkey"],
            partial_aggs=[
                F.count(F.lit(1)).alias("_n"),
                F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_qty"),
            ],
            final_aggs=lambda p: [
                F.sum("_n").alias("n"),
                F.sum("_qty").alias("qty"),
            ],
            salt_from="l_orderkey",
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part").withColumnRenamed("p_partkey", "l_partkey")
    plain = sorted(
        map(
            tuple,
            li.join(part.select("l_partkey", "p_name"), "l_partkey")
            .select("l_partkey", "l_orderkey", "p_name")
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_join(
                li, part.select("l_partkey", "p_name"), on="l_partkey",
                salt_from="l_orderkey",
            )
            .select("l_partkey", "l_orderkey", "p_name")
            .collect(),
        )
    )
    assert plain == salted


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics observed end-to-end: an event
    older than (max ts - watermark) arriving in a later micro-batch is
    dropped from its (already-closed) window."""
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("k", T.StringType()),
        ]
    )
    batch1 = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:01:00", "2024-01-01 00:02:00", "2024-01-01 02:00:00"]
            ),
            "k": ["a", "a", "a"],
        }
    )
    batch2 = pd.DataFrame(  # 00:03 is > 1h older than the 02:00 watermark
        {"ts": pd.to_datetime(["2024-01-01 00:03:00"]), "k": ["a"]}
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(str(src))

    agg = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName("wm_test").start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (str(r["ws"]), r["k"]): r["n"] for r in spark.table("wm_test").collect()
    }
    # the 00:00-00:10 window closed with 2 rows; the late 00:03 event
    # must NOT re-open it (no third count anywhere for that window)
    assert rows.get(("2024-01-01 00:00:00", "a")) == 2


def test_stream_sessions_match_batch_sessionize(spark):
    """The native session_window stream (drained via the flush events)
    must produce the same per-user session structure as a batch
    gaps-and-islands computation with the session_window boundary rule
    (gap >= 30 min starts a new session): identical user sets, and per
    user the identical multiset of session sizes."""
    from collections import Counter

    from pyspark.sql import Window as W

    from bigdatafinalproject_spark.streaming.events import session_counts

    streamed = session_counts(spark, SF_DIR)

    e = load_table(spark, SF_DIR, "events")
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(seq).cast("long")
    is_new = F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0)
    batch = (
        e.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id",
            F.sum("is_new")
            .over(seq.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )

    s_sizes: dict[int, Counter] = {}
    for r in streamed.collect():
        s_sizes.setdefault(r["user_id"], Counter())[r["n_events"]] += 1
    b_sizes: dict[int, Counter] = {}
    for r in batch.collect():
        b_sizes.setdefault(r["user_id"], Counter())[r["n_events"]] += 1
    assert s_sizes == b_sizes


def test_stream_user_totals_match_batch_totals(spark):
    """The applyInPandasWithState running totals, drained on finite
    input, must equal the batch groupBy: same users, same event counts,
    same value sums (float sums compare under a tiny tolerance — the
    state accumulates in arrival order, the batch agg in partition
    order)."""
    from bigdatafinalproject_spark.streaming.events import running_user_totals

    streamed = running_user_totals(spark, SF_DIR)
    # update-mode sink: keep the LAST emitted row per user (one batch
    # per file here, but stay correct if the source ever splits batches)
    final: dict[int, tuple[int, float]] = {}
    for r in streamed.collect():
        final[r["user_id"]] = (r["n_events"], r["total_value"])

    e = load_table(spark, SF_DIR, "events")
    batch = {
        r["user_id"]: (r["n"], r["total"])
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for u, (n, total) in final.items():
        bn, btotal = batch[u]
        assert n == bn, f"user {u}: {n} != {bn}"
        assert abs(total - btotal) <= 1e-6 * max(1.0, abs(btotal)), u


def test_session_stream_provider_independent_rocksdb(spark):
    """State-store provider independence: the sessionizer must produce
    identical results under RocksDBStateStoreProvider (the spillable,
    changelog-checkpointed backend you run at large state sizes) and
    the default HDFS-backed in-memory provider. Provider is a
    per-query-start conf: set, run, restore."""
    from bigdatafinalproject_spark.streaming.events import session_counts

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key)
    baseline = sorted(map(tuple, session_counts(spark, SF_DIR).collect()))
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = sorted(map(tuple, session_counts(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, default)
    assert rocks == baseline


def test_dlq_disposition_routes_null_type_to_exactly_one_sink(spark):
    """Three-valued-logic regression (ADVICE r7): a row with NULL
    event_type and a healthy value made the old filter-pair predicate
    NULL, dropping the row from BOTH sinks. The disposition column
    must route every row to exactly one side, NULLs to 'ok' (matching
    the oracle's CASE)."""
    from bigdatafinalproject_spark.streaming.events import dlq_disposition

    rows = [
        (None, 5.0, "ok"),      # NULL type, healthy value -> ok
        (None, -1.0, "dlq"),    # NULL type, poison value -> dlq
        (None, None, "dlq"),
        ("error", 5.0, "dlq"),
        ("click", None, "dlq"),
        ("click", -0.5, "dlq"),
        ("click", 5.0, "ok"),
    ]
    df = spark.createDataFrame(
        [(t, v) for t, v, _ in rows], "event_type string, value double"
    ).withColumn("disp", dlq_disposition())
    got = [
        r.disp
        for r in df.orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("value").asc_nulls_first(),
        ).collect()
    ]
    want = [
        e
        for _, _, e in sorted(
            rows, key=lambda r: (r[0] is not None, r[0] or "", r[1] is not None, r[1] or 0.0)
        )
    ]
    assert got == want
    # lossless + exclusive: the two sides partition the frame
    n = df.count()
    assert df.filter(F.col("disp") == "ok").count() + df.filter(
        F.col("disp") == "dlq"
    ).count() == n
