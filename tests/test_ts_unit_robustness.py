"""The physical type of events.ts has changed across driver testdata
regenerations (r1: TIMESTAMP(NANOS) int64; r3: timestamp[us] naive).
These tests pin the engine's invariance: IDENTICAL results from the
same logical data stored in either unit, through both the batch loader
and the streaming reader."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdatafinalproject_spark.catalog import load_table

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def unit_dirs(tmp_path_factory):
    """Two sf_dir-shaped dirs holding the SAME events, one stored as
    timestamp[ns] (nanos) and one as timestamp[us]."""
    t = pq.read_table(SRC)
    i = t.schema.get_field_index("ts")
    ts_us = t.column("ts").cast(pa.timestamp("us"))
    dirs = {}
    for unit, col in (("ns", ts_us.cast(pa.timestamp("ns"))), ("us", ts_us)):
        d = tmp_path_factory.mktemp(f"events_{unit}")
        pq.write_table(
            t.set_column(i, pa.field("ts", col.type), col), d / "events.parquet"
        )
        dirs[unit] = str(d)
    return dirs


def test_batch_loader_normalizes_both_units(spark, unit_dirs):
    frames = {u: load_table(spark, d, "events") for u, d in unit_dirs.items()}
    for u, df in frames.items():
        assert dict(df.dtypes)["ts"] == "timestamp", f"{u}: {df.dtypes}"
    rows = {
        u: sorted(
            (r.event_id, str(r.ts))
            for r in df.select("event_id", "ts").collect()
        )
        for u, df in frames.items()
    }
    assert rows["ns"] == rows["us"]
    assert len(rows["ns"]) > 0


def test_streaming_reader_normalizes_both_units(spark, unit_dirs):
    from bigdatafinalproject_spark.streaming.events import tumbling_counts

    out = {}
    for u, d in unit_dirs.items():
        got = tumbling_counts(spark, d)
        out[u] = sorted(
            (r.window_start, r.event_type, r.n, r.total_value)
            for r in got.collect()
        )
    assert out["ns"] == out["us"]
    assert len(out["ns"]) > 0
