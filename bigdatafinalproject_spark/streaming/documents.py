"""Streaming text ingest (SURVEY §7.7 breadth): a stateless corpus
quality filter over a document stream.

The file source stands in for Kafka as in streaming/events.py; the
transform is pure projection + filter, so append-mode output is
row-identical to the batch run of the same expressions — the strongest
correctness statement available for a stream (and a true DuckDB
oracle). Stateless streams carry ZERO state-store cost: at 100 TB/day
this path scales with source parallelism alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bigdatafinalproject_spark.catalog import table_path
from bigdatafinalproject_spark.streaming.schema import (
    cast_to_canonical,
    footer_read_schema,
)
from bigdatafinalproject_spark.operators.text import quality_score

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _doc_stream_dir(sf_dir: str) -> str:
    """Stage the single-file documents table into a directory for the
    parquet file source (same symlink scheme as streaming/events)."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(table_path(sf_dir, "documents"))
    tag = hashlib.md5(src.encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"bdfp_docstream_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "documents.parquet")
    if os.path.lexists(link) and os.readlink(link) != src:
        os.unlink(link)
    if not os.path.lexists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass
    return d


def stream_quality_filter(
    spark: SparkSession, sf_dir: str, min_quality: float = 0.8
) -> DataFrame:
    """Run the quality filter as a stream to completion; return the
    sink contents (doc_id, lang, quality) for kept docs."""
    raw = (
        spark.readStream.schema(
            footer_read_schema(table_path(sf_dir, "documents"))
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(_doc_stream_dir(sf_dir))
    )
    raw = cast_to_canonical(raw, _DOC_SCHEMA)
    # stateless path: projection + filter only (no joins, no state)
    scored = quality_score(raw, "text", "doc_id")
    out = scored.filter(scored["quality"] >= min_quality).select(
        "doc_id", "n_tokens", "quality"
    )
    # stable sink name: repeated runs REPLACE the driver-cached memory
    # table instead of leaking a new one per call (same policy as
    # streaming/events._run_to_memory)
    name = "bdfp_mem_doc_quality"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_novel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental exact dedup: the document stream (the
    'new batch' slice, doc_id % 5 == 0) LEFT ANTI joined per
    micro-batch against the STATIC corpus digest index (distinct md5
    of every other doc) — only never-seen-before content passes.

    This is the streaming twin of operators/dedup.incremental_dedup's
    exact tier, and the zero-state shape: a stream-static anti join
    keeps NO join state (the static index is re-planned and broadcast
    per micro-batch), so state size is independent of stream length —
    unlike a streaming dropDuplicates, whose state grows with distinct
    keys and needs a watermark to bound. Finite input + append mode =>
    row-identical to the batch anti join (true DuckDB oracle)."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.operators.text import norm_text

    raw = (
        spark.readStream.schema(
            footer_read_schema(table_path(sf_dir, "documents"))
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(_doc_stream_dir(sf_dir))
    )
    raw = cast_to_canonical(raw, _DOC_SCHEMA)
    batch_docs = raw.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5(norm_text(F.col("text"))).alias("digest")
    )
    corpus_index = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 != 0)
        .select(F.md5(norm_text(F.col("text"))).alias("digest"))
        .distinct()
    )
    novel = batch_docs.join(F.broadcast(corpus_index), "digest", "left_anti")
    name = "bdfp_mem_doc_novel"
    q = (
        novel.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
