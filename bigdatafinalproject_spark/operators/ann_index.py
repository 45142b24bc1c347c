"""Persisted ANN indexes: train/encode ONCE, serve many queries — the
production deployment shape for the trained IVF/PQ tiers (r8).

``ivf_topk`` / ``pq_topk`` are end-to-end plans: every invocation
re-trains the quantizer and re-encodes the corpus (6-9 s at sf0.1
after the r8 training upgrade). A real retrieval deployment runs the
build as a batch job and serves queries against the PERSISTED index;
this module provides exactly that split on top of the
``*_build_frames`` / ``*_search_frames`` halves in operators/ann.py:

- build: materialize the index frames (IVF: centroids + postings; PQ:
  codebook + codes + exact norms) into a writer-unique tmp directory
  with a ``_meta.json`` manifest (kind, fingerprint, tables, source
  path, BUILD PARAMS) written LAST, then install with one atomic
  rename — readers never observe a half-built index, and a crashed
  build leaves no manifest so it never serves.
- ensure: rebuild only when the manifest is missing or its
  ``fingerprint`` (source identity + params + ALGORITHM VERSION)
  differs; an unchanged one is served straight from parquet, across
  process boundaries (fingerprint-named shared cache under a per-user
  root). After a successful install, superseded fingerprints of the
  same (kind, source) are garbage-collected.
- append: incremental maintenance against the FROZEN quantizer. The
  append invalidates the manifest FIRST, appends, then re-commits —
  a crash mid-append leaves no manifest, so a partially-appended
  index (codes without norms) can never serve silently. Append
  hyperparameters come from the manifest, never the caller — a
  mismatched m/dim cannot silently corrupt the encoding.
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
import shutil

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.operators.ann import (
    ivf_build_frames,
    ivf_search_frames,
    pq_build_frames,
    pq_search_frames,
)

_META = "_meta.json"
# salt the fingerprint with the builder ALGORITHM version: a code
# change to the build halves under unchanged corpus+params must
# invalidate cached indexes (r8 review finding #2) — bump on any
# change to ivf_build_frames / pq_build_frames / append encoding
_ALGO_VERSION = 1


def _manifest(index_dir: str) -> dict | None:
    try:
        with open(os.path.join(index_dir, _META)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _commit(
    index_dir: str,
    kind: str,
    fingerprint: str,
    tables: list[str],
    src: str | None = None,
    params: dict | None = None,
    applied_batches: list | None = None,
) -> None:
    # tmp + os.replace: the manifest IS the commit record, so its own
    # write must be atomic — a crash mid-write must read as "no
    # manifest" (rebuild), never as a torn half-manifest
    path = os.path.join(index_dir, _META)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "kind": kind,
                "fingerprint": fingerprint,
                "tables": tables,
                "src": src,
                "params": params or {},
                "applied_batches": sorted(applied_batches or []),
            },
            f,
        )
    os.replace(tmp, path)


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
    """Source identity + hyperparameters + builder version: file path,
    size and mtime of the corpus parquet, the sorted param map, and
    _ALGO_VERSION — any change invalidates the persisted index (the
    full-identity-in-the-tag lesson from the chunk stagers)."""
    import hashlib

    st = os.stat(path)
    ident = json.dumps(
        {
            "path": os.path.abspath(path),
            "size": st.st_size,
            "mtime_ns": st.st_mtime_ns,
            "params": {k: params[k] for k in sorted(params)},
            "algo_version": _ALGO_VERSION,
        },
        sort_keys=True,
    )
    return hashlib.md5(ident.encode()).hexdigest()


def shared_index_dir(kind: str, fingerprint: str) -> str:
    """Cross-process index cache location, keyed by the FINGERPRINT
    (not the pid): a corpus version's index is built once per host and
    served by every later process. The root is PER-USER (uid-suffixed,
    0o700) so two users on one host cannot collide on — or poison —
    each other's predictable cache paths (r8 review finding #5);
    superseded fingerprints of the same source are GC'd at install
    time, bounding the cache at one dir per (kind, live corpus
    version, params)."""
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), f"bdfp_annidx_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    return os.path.join(root, f"{kind}_{fingerprint[:16]}")


def _gc_superseded(index_dir: str, kind: str, src: str | None) -> None:
    """Drop sibling cache entries of the same (kind, source) with a
    DIFFERENT fingerprint — they are superseded corpus/param/code
    versions that would otherwise accrete in /tmp forever (r8 review
    finding #5). Best-effort; never fails the install."""
    if src is None:
        return
    root = os.path.dirname(index_dir)
    try:
        names = os.listdir(root)
    except OSError:
        return
    for n in names:
        p = os.path.join(root, n)
        if p == index_dir or not n.startswith(f"{kind}_"):
            continue
        m = _manifest(p)
        if m is not None and m.get("kind") == kind and m.get("src") == src:
            shutil.rmtree(p, ignore_errors=True)


def _install_build(tmp: str, index_dir: str, kind: str, fingerprint: str) -> str:
    """Atomically install a finished build. Order of operations never
    deletes a CURRENT index (r8 review finding #1): adopt-if-current
    first, then attempt the rename, and clear a stale/corrupt blocker
    only after the rename fails and the blocker is re-verified
    non-current. Two builders of the same fingerprint produce
    identical content by determinism, so whoever wins, readers serve
    the same bytes."""
    if index_is_current(index_dir, kind, fingerprint):
        shutil.rmtree(tmp, ignore_errors=True)
        return index_dir
    try:
        os.rename(tmp, index_dir)
        return index_dir
    except OSError:
        pass
    if index_is_current(index_dir, kind, fingerprint):
        shutil.rmtree(tmp, ignore_errors=True)
        return index_dir
    # blocker is stale or corrupt (same path can only mean same
    # fingerprint in the shared cache, so this is a crash artifact or
    # a legacy/explicit-dir layout): clear it and retry once
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp, index_dir)
    return index_dir


def _build_into_tmp(index_dir: str):
    # pid + thread id: two THREADED builders of the same fingerprint
    # must not interleave parquet writes into one tmp dir (caught by
    # tests/test_ann_index.py's threaded double-build race)
    import threading

    tmp = f"{index_dir}.build.{os.getpid()}.{threading.get_ident()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    return tmp


def ensure_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    fingerprint: str,
    src: str | None = None,
    **build_params,
) -> str:
    """Build the IVF index iff absent/stale; returns ``index_dir``."""
    if index_is_current(index_dir, "ivf", fingerprint):
        return index_dir
    tmp = _build_into_tmp(index_dir)
    try:
        centroids, postings = ivf_build_frames(corpus, **build_params)
        centroids.write.mode("overwrite").parquet(
            os.path.join(tmp, "centroids")
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(tmp, "postings")
        )
        _commit(
            tmp, "ivf", fingerprint, ["centroids", "postings"],
            src=src, params=build_params,
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # no abandoned tmp dirs
        raise
    out = _install_build(tmp, index_dir, "ivf", fingerprint)
    _gc_superseded(out, "ivf", src)
    return out


def ivf_index_append(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> str:
    """Incremental IVF index maintenance: assign a DELTA batch to the
    FROZEN persisted centroids (multi-assignment read from the
    manifest, never the caller) and append its postings — no retrain,
    no base re-assignment. The manifest is removed before the append
    and re-committed after, so a crash mid-append leaves a
    non-current index that is rebuilt, never served incomplete.
    Documented drift trade: centroids reflect the base distribution —
    retrain on a schedule, append between retrains."""
    from bigdatafinalproject_spark.operators.ann import _nearest_centroids

    meta = _manifest(index_dir)
    if meta is None:
        raise ValueError(f"no committed index at {index_dir!r} to append to")
    applied = list(meta.get("applied_batches", []))
    if batch_id is not None and batch_id in applied:
        return index_dir  # redelivered batch: idempotent skip
    multi = int(meta.get("params", {}).get("multi_assign", 1))
    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    postings = _nearest_centroids(
        centroids, delta, id_col, vec_col, multi, "neighbor_id"
    )
    os.remove(os.path.join(index_dir, _META))  # invalidate during append
    postings.write.mode("append").parquet(
        os.path.join(index_dir, "postings")
    )
    _commit(
        index_dir, meta["kind"], meta["fingerprint"], meta["tables"],
        src=meta.get("src"), params=meta.get("params"),
        applied_batches=applied + ([batch_id] if batch_id is not None else [len(applied)]),
    )
    return index_dir


def ensure_pq_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    fingerprint: str,
    src: str | None = None,
    **build_params,
) -> str:
    """Build the PQ index iff absent/stale; returns ``index_dir``.
    Same atomic tmp-build + rename install as ensure_ivf_index."""
    if index_is_current(index_dir, "pq", fingerprint):
        return index_dir
    tmp = _build_into_tmp(index_dir)
    try:
        cb, codes, norms = pq_build_frames(corpus, **build_params)
        cb.write.mode("overwrite").parquet(os.path.join(tmp, "codebook"))
        codes.write.mode("overwrite").parquet(os.path.join(tmp, "codes"))
        norms.write.mode("overwrite").parquet(os.path.join(tmp, "norms"))
        _commit(
            tmp, "pq", fingerprint, ["codebook", "codes", "norms"],
            src=src, params=build_params,
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    out = _install_build(tmp, index_dir, "pq", fingerprint)
    _gc_superseded(out, "pq", src)
    return out


def pq_index_append(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> str:
    """Incremental PQ index maintenance: encode a DELTA batch against
    the FROZEN persisted codebook (m/dim read from the manifest, never
    the caller — a mismatched subspace layout cannot silently corrupt
    the encoding) and append its codes + exact norms. The manifest is
    removed before the two appends and re-committed after BOTH — a
    crash in between leaves a non-current index (rebuilt, never
    served with codes-but-no-norms, which the ADC inner join would
    otherwise silently drop). Drift trade as in
    :func:`ivf_index_append`."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.operators.ann import _pq_exprs

    meta = _manifest(index_dir)
    if meta is None:
        raise ValueError(f"no committed index at {index_dir!r} to append to")
    applied = list(meta.get("applied_batches", []))
    if batch_id is not None and batch_id in applied:
        return index_dir  # redelivered batch: idempotent skip
    params = meta.get("params", {})
    m = int(params.get("m", 8))
    dim = int(params.get("dim", 64))
    cb = spark.read.parquet(os.path.join(index_dir, "codebook"))
    # encode the delta exactly as pq_build_frames encodes the corpus:
    # broadcast codebook join + struct-min argmin per (vector, subspace)
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
    os.remove(os.path.join(index_dir, _META))  # invalidate during append
    dcodes.write.mode("append").parquet(os.path.join(index_dir, "codes"))
    dnorms.write.mode("append").parquet(os.path.join(index_dir, "norms"))
    _commit(
        index_dir, meta["kind"], meta["fingerprint"], meta["tables"],
        src=meta.get("src"), params=params,
        applied_batches=applied + ([batch_id] if batch_id is not None else [len(applied)]),
    )
    return index_dir


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
