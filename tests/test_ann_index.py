"""Persisted ANN index (operators/ann_index.py): build-once semantics,
fingerprint invalidation, and the persistence theorem (served results
== end-to-end results, which the shared oracles also check)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table, table_path
from bigdatafinalproject_spark.operators.ann import ivf_topk
from bigdatafinalproject_spark.operators.ann_index import (
    corpus_fingerprint,
    ensure_ivf_index,
    index_is_current,
    ivf_index_search,
)
from tests.conftest import SF_DIR

_PARAMS = dict(
    centroid_mod=37, max_centroids=64, train_rounds=2, multi_assign=3
)


def test_index_build_once_serve_identical_and_invalidate(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    idx = str(tmp_path / "ivf_idx")
    fp = corpus_fingerprint(table_path(SF_DIR, "embeddings"), **_PARAMS)

    ensure_ivf_index(spark, emb, idx, fp, **_PARAMS)
    meta = os.path.join(idx, "_meta.json")
    mtime = os.path.getmtime(meta)

    # persistence theorem: served results == end-to-end results
    served = {
        tuple(r)
        for r in ivf_index_search(
            spark, idx, emb, queries, k=10, nprobe=8
        ).collect()
    }
    direct = {
        tuple(r)
        for r in ivf_topk(emb, queries, k=10, nprobe=8, **{
            k: v for k, v in _PARAMS.items()
        }).collect()
    }
    assert served == direct and len(served) > 0

    # build-once: an unchanged fingerprint does not rebuild
    ensure_ivf_index(spark, emb, idx, fp, **_PARAMS)
    assert os.path.getmtime(meta) == mtime
    assert index_is_current(idx, "ivf", fp)

    # changed hyperparameters -> different fingerprint -> rebuild
    fp2 = corpus_fingerprint(
        table_path(SF_DIR, "embeddings"), **{**_PARAMS, "multi_assign": 2}
    )
    assert fp2 != fp
    assert not index_is_current(idx, "ivf", fp2)
    ensure_ivf_index(
        spark, emb, idx, fp2, **{**_PARAMS, "multi_assign": 2}
    )
    assert index_is_current(idx, "pq", fp2) is False  # kind-checked too
    assert index_is_current(idx, "ivf", fp2)
    assert os.path.getmtime(meta) > mtime


def test_crashed_build_leaves_no_manifest_and_rebuilds(spark, tmp_path):
    """The manifest is the commit record: a build interrupted before
    _commit leaves tables without _meta.json, which ensure_* treats as
    absent (no partial index ever serves)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf_crash")
    fp = corpus_fingerprint(table_path(SF_DIR, "embeddings"), **_PARAMS)
    ensure_ivf_index(spark, emb, idx, fp, **_PARAMS)
    os.remove(os.path.join(idx, "_meta.json"))  # simulate pre-commit crash
    assert not index_is_current(idx, "ivf", fp)
    ensure_ivf_index(spark, emb, idx, fp, **_PARAMS)
    assert index_is_current(idx, "ivf", fp)


def test_append_batch_ids_make_redelivery_idempotent(spark, tmp_path):
    """The index manifest records applied batch ids: a redelivered
    batch (same id) is skipped, so checkpoint-replayed micro-batches
    cannot double-append codes/norms (a double-append would double ADC
    scores — the streaming maintenance oracle would catch it)."""
    import json
    import os

    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table, table_path
    from bigdatafinalproject_spark.operators.ann_index import (
        corpus_fingerprint,
        ensure_pq_index,
        pq_index_append,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0)
    params = dict(
        m=16, dim=64, codeword_mod=13, max_codewords=64, train_rounds=1
    )
    idx = str(tmp_path / "pq_redeliver")
    fp = corpus_fingerprint(table_path(SF_DIR, "embeddings"), **params)
    ensure_pq_index(spark, base, idx, fp, **params)

    pq_index_append(spark, idx, delta, batch_id=0)
    n_codes = spark.read.parquet(f"{idx}/codes").count()
    n_norms = spark.read.parquet(f"{idx}/norms").count()

    # redelivery: same batch id -> idempotent skip, nothing grows
    pq_index_append(spark, idx, delta, batch_id=0)
    assert spark.read.parquet(f"{idx}/codes").count() == n_codes
    assert spark.read.parquet(f"{idx}/norms").count() == n_norms
    meta = json.load(open(os.path.join(idx, "_meta.json")))
    assert meta["applied_batches"] == [0]

    # a NEW batch id applies (empty delta is fine for the protocol)
    pq_index_append(spark, idx, delta.limit(0), batch_id=1)
    meta = json.load(open(os.path.join(idx, "_meta.json")))
    assert meta["applied_batches"] == [0, 1]


def test_threaded_double_build_installs_one_current_index(spark, tmp_path):
    """Two builders racing for the SAME fingerprint: whatever the
    interleaving, both calls return, the index ends current, serves
    correct results, and no writer-unique tmp dirs are left behind
    (deterministic builds mean either winner's bytes are right)."""
    import glob
    import threading

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "ivf_race")
    fp = corpus_fingerprint(table_path(SF_DIR, "embeddings"), **_PARAMS)
    errors = []
    barrier = threading.Barrier(2)

    def build():
        try:
            barrier.wait()
            ensure_ivf_index(spark, emb, idx, fp, **_PARAMS)
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors.append(e)

    ts = [threading.Thread(target=build) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert index_is_current(idx, "ivf", fp)
    assert not glob.glob(f"{idx}.build.*"), "abandoned build tmp dirs"
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    assert ivf_index_search(spark, idx, emb, queries, k=10).count() > 0
