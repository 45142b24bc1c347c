"""Sequence packing (net-new LLM-pipeline surface): greedily pack
documents into fixed-capacity token bins ("context windows") — the
step that turns a deduped corpus into training sequences.

Greedy first-fit is inherently sequential, so it cannot be a window
function; the scale story is SHARDING: docs are split into portable-
hash shards, packing runs independently (and in parallel) inside each
shard via ``applyInPandas``, and bin ids are (shard, bin) pairs. At
100 TB the shard count scales with the cluster; each shard's group
fits one task. Packing quality loss vs global greedy is negligible for
realistic doc/capacity ratios (bins ~uniformly filled).

Determinism: shard = portable md5 bucket of doc_id, in-shard order =
doc_id — reproducible across runs, partitionings, and engines (the
DuckDB oracle replays it with a linear recursive CTE that advances
every shard one doc per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatafinalproject_spark.functions import bucket

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin", T.IntegerType()),
        T.StructField("tok", T.IntegerType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    capacity: int,
    num_shards: int = 32,
    seed: int = 5,
) -> DataFrame:
    """Greedy first-fit packing of (id, token_count) rows into bins of
    ``capacity`` tokens, sharded for parallelism.

    Rules (mirrored exactly by the oracle): docs are packed in id order
    within their shard; a doc joins the current bin iff fill + tok <=
    capacity, else it OPENS a new bin (an oversized doc > capacity gets
    a bin of its own). Returns (doc_id, shard, bin, tok)."""
    sharded = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        bucket(id_col, k=num_shards, seed=seed).alias("shard"),
        F.col(token_count_col).cast("int").alias("tok"),
    )

    cap = capacity

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        cur_bin, fill = 0, 0
        first = True
        for tok in pdf["tok"]:
            t = int(tok)
            if first:
                cur_bin, fill, first = 0, t, False
            elif fill + t <= cap:
                fill += t
            else:
                cur_bin += 1
                fill = t
            bins.append(cur_bin)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        return pdf[["doc_id", "shard", "bin", "tok"]]

    return sharded.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
