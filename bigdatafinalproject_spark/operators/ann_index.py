"""Persisted ANN indexes: train/encode ONCE, serve many queries — the
production deployment shape for the trained IVF/PQ tiers (r8).

``ivf_topk`` / ``pq_topk`` are end-to-end plans: every invocation
re-trains the quantizer and re-encodes the corpus (6-9 s at sf0.1
after the r8 training upgrade). A real retrieval deployment runs the
build as a batch job and serves queries against the PERSISTED index;
this module provides exactly that split on top of the
``*_build_frames`` / ``*_search_frames`` halves in operators/ann.py:

- build: materialize the index frames (IVF: centroids + postings; PQ:
  codebook + codes + exact norms) to parquet tables under one index
  directory, with a ``_meta.json`` manifest written LAST — a crash
  mid-build leaves no manifest, and ``ensure_*`` treats the directory
  as absent and rebuilds (the manifest is the commit record).
- ensure: rebuild only when the manifest is missing or its
  ``fingerprint`` (caller-supplied: source identity + params) differs
  — a regenerated corpus or changed hyperparameters invalidates the
  index; an unchanged one is served straight from parquet.
- search: the same serve plans as the end-to-end operators, reading
  the persisted frames. Every build quantity is deterministic, so a
  reloaded index is bit-identical to a fresh build and the registered
  index-search queries share the end-to-end queries' oracles.

100 TB shape: the index tables are the small side (centroids/codebook
are kBs and broadcast; postings/codes are key-only rows, ~1/16th the
corpus bytes at m=16); the corpus full-precision vectors stay in the
base table and are touched only for the bounded rerank pool.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.operators.ann import (
    ivf_build_frames,
    ivf_search_frames,
    pq_build_frames,
    pq_search_frames,
)

_META = "_meta.json"


def _manifest(index_dir: str) -> dict | None:
    try:
        with open(os.path.join(index_dir, _META)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _commit(index_dir: str, kind: str, fingerprint: str, tables: list[str]) -> None:
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(
            {"kind": kind, "fingerprint": fingerprint, "tables": tables}, f
        )


def index_is_current(index_dir: str, kind: str, fingerprint: str) -> bool:
    m = _manifest(index_dir)
    return (
        m is not None
        and m.get("kind") == kind
        and m.get("fingerprint") == fingerprint
        and all(
            os.path.isdir(os.path.join(index_dir, t))
            for t in m.get("tables", [])
        )
    )


def corpus_fingerprint(path: str, **params) -> str:
    """Source identity + hyperparameters: file path, size and mtime of
    the corpus parquet plus the sorted param map — any change
    invalidates the persisted index (the full-identity-in-the-tag
    lesson from the chunk stagers)."""
    import hashlib

    st = os.stat(path)
    ident = json.dumps(
        {
            "path": os.path.abspath(path),
            "size": st.st_size,
            "mtime_ns": st.st_mtime_ns,
            "params": {k: params[k] for k in sorted(params)},
        },
        sort_keys=True,
    )
    return hashlib.md5(ident.encode()).hexdigest()


def shared_index_dir(kind: str, fingerprint: str) -> str:
    """Cross-process index cache location, keyed by the FINGERPRINT
    (not the pid): a corpus version's index is built once per host and
    served by every later process — the "per corpus version, not per
    query" cost claim made real across process boundaries. Stale
    corpora/params hash to different directories; the cache is bounded
    by distinct (kind, corpus version, params) tuples."""
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"bdfp_annidx_{kind}_{fingerprint[:16]}"
    )


def _publish_build(tmp: str, index_dir: str, kind: str, fingerprint: str) -> str:
    """Atomically install a finished build: rename the writer-unique
    tmp dir into place. First writer wins; a loser (rename fails
    because the winner landed) verifies the winner is current, drops
    its own identical-by-determinism copy, and adopts."""
    import shutil

    try:
        os.rename(tmp, index_dir)
    except OSError:
        if index_is_current(index_dir, kind, fingerprint):
            shutil.rmtree(tmp, ignore_errors=True)
            return index_dir
        raise
    return index_dir


def ensure_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    fingerprint: str,
    **build_params,
) -> str:
    """Build the IVF index iff absent/stale; returns ``index_dir``.
    Builds land in a writer-unique tmp dir and install via one atomic
    rename, so readers never observe a half-built index and concurrent
    builders of the same fingerprint cannot interleave."""
    import shutil

    if index_is_current(index_dir, "ivf", fingerprint):
        return index_dir
    tmp = f"{index_dir}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    centroids, postings = ivf_build_frames(corpus, **build_params)
    centroids.write.mode("overwrite").parquet(os.path.join(tmp, "centroids"))
    postings.write.mode("overwrite").parquet(os.path.join(tmp, "postings"))
    _commit(tmp, "ivf", fingerprint, ["centroids", "postings"])
    shutil.rmtree(index_dir, ignore_errors=True)  # drop any stale build
    return _publish_build(tmp, index_dir, "ivf", fingerprint)


def ivf_index_search(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 8,
) -> DataFrame:
    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    return ivf_search_frames(
        centroids, postings, corpus, queries,
        id_col=id_col, vec_col=vec_col, k=k, nprobe=nprobe,
    )


def ensure_pq_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    fingerprint: str,
    **build_params,
) -> str:
    """Build the PQ index iff absent/stale; returns ``index_dir``.
    Same atomic tmp-build + rename install as ensure_ivf_index."""
    import shutil

    if index_is_current(index_dir, "pq", fingerprint):
        return index_dir
    tmp = f"{index_dir}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    cb, codes, norms = pq_build_frames(corpus, **build_params)
    cb.write.mode("overwrite").parquet(os.path.join(tmp, "codebook"))
    codes.write.mode("overwrite").parquet(os.path.join(tmp, "codes"))
    norms.write.mode("overwrite").parquet(os.path.join(tmp, "norms"))
    _commit(tmp, "pq", fingerprint, ["codebook", "codes", "norms"])
    shutil.rmtree(index_dir, ignore_errors=True)
    return _publish_build(tmp, index_dir, "pq", fingerprint)


def ivf_index_append(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_assign: int = 1,
) -> str:
    """Incremental IVF index maintenance: assign a DELTA batch to the
    FROZEN persisted centroids (same multi-assignment as the build)
    and append its postings — no retrain, no base re-assignment. Same
    freshness pattern and documented drift trade as
    :func:`pq_index_append` (centroids trained on the base
    distribution; retrain on a schedule, append between retrains)."""
    from bigdatafinalproject_spark.operators.ann import _nearest_centroids

    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    postings = _nearest_centroids(
        centroids, delta, id_col, vec_col, multi_assign, "neighbor_id"
    )
    postings.write.mode("append").parquet(
        os.path.join(index_dir, "postings")
    )
    return index_dir


def pq_index_append(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> str:
    """Incremental PQ index maintenance: encode a DELTA batch against
    the FROZEN persisted codebook and append its codes + norms — never
    retraining, never re-encoding the existing corpus. This is the
    production freshness pattern (index maintenance costs the delta);
    the trade is documented drift: a codebook trained on the base
    distribution quantizes delta vectors with base-era resolution —
    retrain on a schedule, append between retrains. The append is
    idempotence-free by design (call once per delta batch; the CDC
    store shows the ledgered variant)."""
    from bigdatafinalproject_spark.operators.ann import (
        pq_search_frames,  # noqa: F401  (doc cross-ref)
    )

    cb = spark.read.parquet(os.path.join(index_dir, "codebook"))
    # encode the delta exactly as pq_build_frames encodes the corpus:
    # broadcast codebook join + struct-min argmin per (vector, subspace)
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.operators.ann import _pq_exprs

    spaces, subv = _pq_exprs(m, dim)
    l2 = F.expr(
        "aggregate(zip_with(_sv, _cw, (x, c) -> "
        "(CAST(x AS DOUBLE) - CAST(c AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(c AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    dcodes = (
        delta.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))
        .select("neighbor_id", spaces, "_v")
        .select("neighbor_id", "s", subv)
        .join(F.broadcast(cb), "s")
        .withColumn("_d", l2)
        .groupBy("neighbor_id", "s")
        .agg(F.min(F.struct("_d", "code")).alias("_b"))
        .select("neighbor_id", "s", F.col("_b.code").alias("code"))
    )
    dnorms = delta.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(
            f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        ).alias("_cnorm"),
    )
    dcodes.write.mode("append").parquet(os.path.join(index_dir, "codes"))
    dnorms.write.mode("append").parquet(os.path.join(index_dir, "norms"))
    return index_dir


def pq_index_search(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    rerank: int = 4,
    scale: int = 1_000_000,
    pool_cap: int = 640,
    scale_ref: int = 1000,
) -> DataFrame:
    cb = spark.read.parquet(os.path.join(index_dir, "codebook"))
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    norms = spark.read.parquet(os.path.join(index_dir, "norms"))
    return pq_search_frames(
        cb, codes, norms, corpus, queries,
        id_col=id_col, vec_col=vec_col, k=k, m=m, dim=dim,
        rerank=rerank, scale=scale, pool_cap=pool_cap,
        scale_ref=scale_ref,
    )
