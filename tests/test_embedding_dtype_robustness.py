"""Testdata regenerations have already flipped a physical type once
(events.ts, the round-2 emergency). The embedding column is the next
most likely flip: list<float> today, list<double> is the other natural
choice. Pin invariance: the ANN cosine query produces IDENTICAL
results (and still matches its DuckDB oracle) from either storage
type."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdatafinalproject_spark import registry

SRC_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dtype_dirs(tmp_path_factory):
    """Two sf_dir-shaped dirs with the SAME embeddings, one float32 and
    one float64 storage."""
    t = pq.read_table(os.path.join(SRC_DIR, "embeddings.parquet"))
    i = t.schema.get_field_index("embedding")
    dirs = {}
    for name, typ in (("f32", pa.float32()), ("f64", pa.float64())):
        col = t.column("embedding").cast(pa.list_(typ))
        d = tmp_path_factory.mktemp(f"emb_{name}")
        pq.write_table(
            t.set_column(i, pa.field("embedding", col.type), col),
            d / "embeddings.parquet",
        )
        dirs[name] = str(d)
    return dirs


def _rows(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    pdf = df.toPandas()
    return sorted(repr(t) for t in pdf[cols].itertuples(index=False))


@pytest.mark.parametrize("qname", ["ann_cosine_topk", "embedding_array_ops"])
def test_embedding_queries_invariant_to_storage_dtype(spark, dtype_dirs, qname):
    """float32-stored and float64-stored embeddings give identical
    results: every consumer promotes elements to double BEFORE
    arithmetic, so storage precision of the SAME values doesn't leak.

    Caveat this test intentionally documents: the current testdata's
    values are float32-representable, so f32->f64 storage keeps the
    same doubles. If a future regeneration writes values with MORE
    precision than float32, results legitimately change — what must
    hold is Spark-vs-oracle parity, checked below."""
    r32 = _rows(spark, dtype_dirs["f32"], qname)
    r64 = _rows(spark, dtype_dirs["f64"], qname)
    assert len(r32) > 0
    assert r32 == r64


@pytest.mark.parametrize("dname", ["f32", "f64"])
def test_ann_cosine_matches_oracle_under_both_dtypes(spark, dtype_dirs, dname):
    """Spark vs DuckDB parity holds for EITHER storage type — the
    invariant that survives any regeneration."""
    sf_dir = dtype_dirs[dname]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}'"
    )
    df = registry.QUERIES["ann_cosine_topk"](spark, sf_dir)
    pdf = df.toPandas()
    ddf = con.execute(registry.ORACLES["ann_cosine_topk"]).fetchdf()
    cols = sorted(pdf.columns)
    s = sorted(repr(t) for t in pdf[cols].itertuples(index=False))
    d = sorted(repr(t) for t in ddf[cols].itertuples(index=False))
    assert len(s) > 0
    assert s == d
    con.close()
