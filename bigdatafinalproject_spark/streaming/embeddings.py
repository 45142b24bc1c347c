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
