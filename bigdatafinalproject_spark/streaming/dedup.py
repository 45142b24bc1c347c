"""Streaming maintenance of the persisted DEDUP index.

The dedup twin of streaming/embeddings' index-maintenance queries: a
crawl pipeline's digest/band index (operators/ann_index
ensure_dedup_index / dedup_index_append / dedup_index_check) kept
current by a documents stream, each micro-batch's distinct digests and
banded MinHash rows appended exactly once (manifest-recorded batch
ids; a checkpoint-redelivered batch is an idempotent skip).

Differences from the ANN kinds, both structural:

- NO retrain-trigger protocol: the index holds exact row-local
  extractions, not a trained quantizer, so appends carry zero drift —
  DISTINCT(build(base) ⊎ append(delta)) ≡ DISTINCT(base ∪ delta) and
  there is nothing a retrain would improve. (needs_retrain still
  computes an appended fraction from the manifest counters; it is
  capacity accounting only here.)
- the shared oracle is the IN-QUERY incremental dedup
  (doc_incremental_dedup): digest/band extraction is row-local, so
  streaming ≡ one-shot maintenance ≡ deriving the index from the full
  corpus in one pass. A hash-green driver row is therefore the
  streaming-maintenance theorem for the dedup family.

Reference behavior: duplicates.py (corpus-side index of the batch
dedup flow); the streaming shape is the net-new 100 TB mandate.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.catalog import table_path
from bigdatafinalproject_spark.streaming.schema import footer_read_schema

# ONE constant each for the standing splits — predicate AND fingerprint
# salt (the r9 review #6 rule: a hand-copied predicate string lets the
# cache key silently stop describing the real subset)
DEDUP_BATCH_PRED = "doc_id % 5 = 0"          # the crawl being checked
DEDUP_CORPUS_PRED = "doc_id % 5 <> 0"        # the standing corpus
DEDUP_BASE_PRED = "doc_id % 5 <> 0 AND doc_id % 3 <> 0"   # index build
DEDUP_DELTA_PRED = "doc_id % 5 <> 0 AND doc_id % 3 = 0"   # appended


def _chunked_doc_delta_dir(sf_dir: str, n_chunks: int = 3) -> str:
    """Stage the documents DELTA (the corpus rows the base index does
    not cover) as n_chunks flat parquet files — the deterministic
    multi-batch file stream (same pattern as the embeddings stager:
    pyarrow-written chunks, content-keyed dir, atomic publish)."""
    import tempfile

    import pyarrow.parquet as pq

    src = os.path.abspath(table_path(sf_dir, "documents"))
    tag = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}|dedupdelta|{n_chunks}".encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"bdfp_docdelta_{tag}")
    if os.path.exists(os.path.join(d, "_STAGED")):
        return d
    t = pq.read_table(src)
    did = t.column("doc_id").to_numpy()
    mask = ((did % 5) != 0) & ((did % 3) == 0)
    delta = t.filter(mask)
    chunk_of = (did[mask] // 3) % n_chunks
    tmp = d + f".tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for c in range(n_chunks):
        pq.write_table(
            delta.filter(chunk_of == c),
            os.path.join(tmp, f"chunk{c}.parquet"),
        )
    open(os.path.join(tmp, "_STAGED"), "w").write(src)
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def stream_dedup_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING dedup-index maintenance: build the base index once
    per corpus fingerprint (base_pred-salted shared cache), CLONE it
    for this stream (snapshot-then-mutate), consume the delta
    documents as a multi-batch file stream with each micro-batch's
    digests/bands appended exactly once, REPLAY chunk 0 through the
    live append path after the drain (at-least-once redelivery — a
    double-append is harmless to the left_semi check but must still
    be an idempotent SKIP, or the manifest's applied_batches would
    lie and the footer accounting would double-count), then dedup the
    standing batch against the maintained index. Shares the
    doc_incremental_dedup oracle (see module docstring)."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.operators.ann_index import (
        clone_index,
        corpus_fingerprint,
        dedup_index_append,
        dedup_index_check,
        ensure_dedup_index,
        shared_index_dir,
    )
    from bigdatafinalproject_spark.queries.layout import _scratch

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.expr(DEDUP_BASE_PRED))
    params = dict(text_col="text", id_col="doc_id", n=8,
                  num_hashes=16, bands=4)
    fp = corpus_fingerprint(
        table_path(sf_dir, "documents"), base_pred=DEDUP_BASE_PRED,
        **params,
    )
    cached = ensure_dedup_index(
        spark, base, shared_index_dir("dedup", fp), fp,
        src=table_path(sf_dir, "documents"), subset=DEDUP_BASE_PRED,
        **params,
    )
    idx = clone_index(cached, _scratch(sf_dir, "dedupstreamidx"))

    d = _chunked_doc_delta_dir(sf_dir)
    raw = (
        spark.readStream.schema(
            footer_read_schema(table_path(sf_dir, "documents"))
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )

    def apply(bdf: DataFrame, bid: int) -> None:
        dedup_index_append(spark, idx, bdf, batch_id=bid)

    q = raw.writeStream.foreachBatch(apply).trigger(availableNow=True).start()
    q.awaitTermination()
    replay = spark.read.parquet(os.path.join(d, "chunk0.parquet"))
    dedup_index_append(spark, idx, replay, batch_id=0)

    batch = docs.filter(F.expr(DEDUP_BATCH_PRED))
    return dedup_index_check(spark, idx, batch)
