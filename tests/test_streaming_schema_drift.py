"""Streaming readers must survive testdata regenerations that flip
physical column types (the round-2 events.ts emergency, generalized):
read schema comes from the parquet FOOTER, canonical casts absorb the
drift. These tests regenerate documents/embeddings with drifted
physical types and pin result equality with the canonical storage."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def drifted_docs_dir(tmp_path_factory):
    """documents with n_chars stored int32 instead of int64."""
    t = pq.read_table(os.path.join(SRC_DIR, "documents.parquet"))
    i = t.schema.get_field_index("n_chars")
    col = t.column("n_chars").cast(pa.int32())
    d = tmp_path_factory.mktemp("docs_i32")
    pq.write_table(
        t.set_column(i, pa.field("n_chars", pa.int32()), col),
        d / "documents.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def drifted_emb_dir(tmp_path_factory):
    """embeddings stored float64 instead of float32."""
    t = pq.read_table(os.path.join(SRC_DIR, "embeddings.parquet"))
    i = t.schema.get_field_index("embedding")
    col = t.column("embedding").cast(pa.list_(pa.float64()))
    d = tmp_path_factory.mktemp("emb_f64")
    pq.write_table(
        t.set_column(i, pa.field("embedding", col.type), col),
        d / "embeddings.parquet",
    )
    return str(d)


def test_doc_stream_survives_int32_n_chars(spark, drifted_docs_dir):
    from bigdatafinalproject_spark.streaming.documents import (
        stream_quality_filter,
    )

    base = sorted(
        map(tuple, stream_quality_filter(spark, SRC_DIR).collect())
    )
    drifted = sorted(
        map(tuple, stream_quality_filter(spark, drifted_docs_dir).collect())
    )
    assert len(base) > 0
    assert base == drifted


def test_emb_stream_survives_float64_embedding(spark, drifted_emb_dir):
    from bigdatafinalproject_spark.streaming.embeddings import stream_lsh_index

    base = sorted(map(tuple, stream_lsh_index(spark, SRC_DIR).collect()))
    drifted = sorted(
        map(tuple, stream_lsh_index(spark, drifted_emb_dir).collect())
    )
    assert len(base) > 0
    assert base == drifted


@pytest.fixture(scope="module")
def drifted_events_dir(tmp_path_factory):
    """events with event_id/user_id stored int32 (values fit exactly)."""
    t = pq.read_table(os.path.join(SRC_DIR, "events.parquet"))
    for name in ("event_id", "user_id"):
        i = t.schema.get_field_index(name)
        t = t.set_column(
            i, pa.field(name, pa.int32()), t.column(name).cast(pa.int32())
        )
    d = tmp_path_factory.mktemp("events_i32")
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_event_stream_survives_int32_ids(spark, drifted_events_dir):
    from bigdatafinalproject_spark.streaming.events import tumbling_counts

    base = sorted(map(tuple, tumbling_counts(spark, SRC_DIR).collect()))
    drifted = sorted(
        map(tuple, tumbling_counts(spark, drifted_events_dir).collect())
    )
    assert len(base) > 0
    assert base == drifted
