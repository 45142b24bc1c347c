"""Streaming maintenance of the persisted DEDUP index.

The dedup twin of streaming/embeddings' index-maintenance queries: a
crawl pipeline's digest/band index (operators/ann_index
ensure_dedup_index / dedup_index_append / dedup_index_check) kept
current by a documents stream, each micro-batch's distinct digests and
banded MinHash rows appended exactly once (manifest-recorded batch
ids; a checkpoint-redelivered batch is an idempotent skip). Rides the
SHARED maintenance scaffold (streaming/embeddings.
_stream_index_maintenance with table="documents" and the documents
chunk stager — r10 review: an earlier draft re-implemented the
scaffold, leaving protocol fixes two copies to patch).

Differences from the ANN kinds, both structural:

- NO retrain-trigger protocol (check_retrain=False): the index holds
  exact row-local extractions, not a trained quantizer, so appends
  carry zero drift — DISTINCT(build(base) ⊎ append(delta)) ≡
  DISTINCT(base ∪ delta) and there is nothing a retrain would
  improve. (needs_retrain still computes an appended fraction from
  the manifest counters; it is capacity accounting only here.)
- the shared oracle is the IN-QUERY incremental dedup
  (doc_incremental_dedup): digest/band extraction is row-local, so
  streaming ≡ one-shot maintenance ≡ deriving the index from the full
  corpus in one pass. A hash-green driver row is therefore the
  streaming-maintenance theorem for the dedup family.

Reference behavior: duplicates.py (corpus-side index of the batch
dedup flow); the streaming shape is the net-new 100 TB mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ONE constant each for the standing splits — predicate AND fingerprint
# salt (the r9 review #6 rule: a hand-copied predicate string lets the
# cache key silently stop describing the real subset)
DEDUP_BATCH_PRED = "doc_id % 5 = 0"          # the crawl being checked
DEDUP_CORPUS_PRED = "doc_id % 5 <> 0"        # the standing corpus
DEDUP_BASE_PRED = "doc_id % 5 <> 0 AND doc_id % 3 <> 0"   # index build
DEDUP_DELTA_PRED = "doc_id % 5 <> 0 AND doc_id % 3 = 0"   # appended


def _chunked_doc_delta_dir(sf_dir: str, n_chunks: int = 3) -> str:
    """Stage the documents DELTA (the corpus rows the base index does
    not cover) as n_chunks flat parquet chunk files via the shared
    stager — the split predicate is part of the cache tag, so editing
    DEDUP_DELTA_PRED can never serve stale staged chunks (r10
    review)."""
    from bigdatafinalproject_spark.streaming.staging import (
        chunked_delta_dir,
    )

    return chunked_delta_dir(
        sf_dir, "documents", "doc_id", "docdelta",
        mask_fn=lambda k: ((k % 5) != 0) & ((k % 3) == 0),
        chunk_fn=lambda k: (k // 3) % n_chunks,
        identity=f"{DEDUP_DELTA_PRED} | chunk=(doc_id//3)%n",
        n_chunks=n_chunks,
    )


def stream_dedup_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING dedup-index maintenance: the shared scaffold builds
    the base index once per corpus fingerprint (base_pred-salted
    shared cache), CLONES it for this stream, consumes the delta
    documents as a multi-batch file stream with each micro-batch's
    digests/bands appended exactly once, and REPLAYS chunk 0 through
    the live append path after the drain (at-least-once redelivery —
    a double-append is harmless to the left_semi check but must still
    be an idempotent SKIP, or the manifest's applied_batches would lie
    and the footer accounting would double-count). Then the standing
    batch is deduped against the maintained index. Shares the
    doc_incremental_dedup oracle (see module docstring)."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.operators.ann_index import (
        DEDUP_INDEX_PARAMS,
        dedup_index_append,
        dedup_index_check,
        ensure_dedup_index,
    )
    from bigdatafinalproject_spark.streaming.embeddings import (
        _stream_index_maintenance,
    )

    docs, idx = _stream_index_maintenance(
        spark, sf_dir, "dedup", "dedupstreamidx",
        ensure_dedup_index, dedup_index_append,
        dict(DEDUP_INDEX_PARAMS),
        DEDUP_BASE_PRED,
        table="documents",
        delta_dir_fn=_chunked_doc_delta_dir,
        check_retrain=False,
    )
    batch = docs.filter(F.expr(DEDUP_BATCH_PRED))
    return dedup_index_check(spark, idx, batch)
