"""Multimodal-column queries (net-new surface): binary payloads with
Arrow-batched Pandas decode (stubbed deterministically — see
operators/multimodal.py) and JVM-side frame slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.multimodal import (
    extract_image_features,
    sample_frames,
    with_binary_payload,
)
from bigdatafinalproject_spark.registry import query


@query(
    "doc_image_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(('0x' || substr(md5(text), 1, 4))::INT % 1024 AS INT) AS width,
           CAST(('0x' || substr(md5(text), 5, 4))::INT % 1024 AS INT) AS height,
           3 AS channels,
           CAST(('0x' || substr(md5(text), 9, 4))::INT % 256 AS DOUBLE) AS mean_pixel
    FROM documents
    """,
)
def doc_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over a binary column: the decode
    is a deterministic md5 stand-in (container has no codecs), the
    Arrow batching / schema / partitioning are the real thing."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    return extract_image_features(docs, id_col="doc_id", payload_col="payload")


@query(
    "doc_frame_sample",
    oracle="""
    -- DuckDB lacks substring-on-BLOB; the documents text is pure ASCII
    -- (verified: octet_length(encode(text)) == length(text) for every
    -- row), so char slicing of the string == byte slicing of the
    -- payload and the md5 digests coincide.
    WITH f AS (SELECT doc_id, CAST(fn AS INT) AS frame_no,
                      substr(text, CAST(fn AS INT) * 256 + 1, 256) AS frame
               FROM documents,
                    LATERAL unnest(range(0, CAST(floor(length(text) / 256)
                                                 AS BIGINT))) AS u(fn)
               WHERE length(text) >= 256)
    SELECT doc_id, frame_no, md5(frame) AS frame_md5
    FROM f WHERE frame_no % 4 = 0
    """,
)
def doc_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: fixed-size binary slices, every 4th kept
    — pure column ops (no Python until a codec is genuinely needed).
    Frames reported as md5 digests for comparability."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    frames = sample_frames(docs, id_col="doc_id", payload_col="payload",
                           frame_bytes=256, stride=4)
    return frames.select("doc_id", "frame_no", F.md5("frame").alias("frame_md5"))
