"""Embedding-cosine near-dup dedup + stream-stream interval join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.ann import embedding_neardup_pairs
from bigdatafinalproject_spark.queries.ann import _DOT_AB, _NORMS_CTE, _PLANE_DOT, _DIM
from bigdatafinalproject_spark.registry import query
from bigdatafinalproject_spark.streaming.joins import (
    click_purchase_join,
    click_purchase_left_join,
)


@query(
    "doc_embedding_neardup",
    oracle=f"""
    WITH {_NORMS_CTE},
    sig AS (SELECT vec_id, CAST(p AS INT) AS p,
                   CASE WHEN {_PLANE_DOT.format(dim1=_DIM + 1)} > 0
                        THEN 1 ELSE 0 END AS bit
            FROM embeddings, LATERAL unnest(range(0, 12)) AS up(p)),
    bands AS (SELECT vec_id, p // 4 AS band,
                     string_agg(CAST(bit AS VARCHAR), '' ORDER BY p) AS band_sig
              FROM sig GROUP BY vec_id, band),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
             WHERE a.vec_id < b.vec_id),
    scored AS (SELECT cand.id_a, cand.id_b,
                      {_DOT_AB.format(a='ea.embedding', b='eb.embedding')}
                          / (na.nrm * nb.nrm) AS cosine
               FROM cand
               JOIN embeddings ea ON ea.vec_id = cand.id_a
               JOIN embeddings eb ON eb.vec_id = cand.id_b
               JOIN norms na ON na.vec_id = cand.id_a
               JOIN norms nb ON nb.vec_id = cand.id_b)
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.3
    """,
)
def doc_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the 5th dedup tier):
    LSH buckets over the whole corpus -> exact cosine >= threshold. Never
    materializes N² pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.3)


@query(
    "stream_click_purchase_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '60 minutes'
    """,
)
def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (clicks x purchases
    within 1 h). Finite input + inner join => the emitted pairs equal
    the batch interval join exactly, so this streams AND oracle-checks."""
    return click_purchase_join(spark, sf_dir, within_minutes=60)


@query(
    "stream_click_purchase_left_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '60 minutes'
    """,
)
def stream_click_purchase_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join — the hard streaming
    shape (NULL emission gated on the other side's watermark; see
    streaming/joins.click_purchase_left_join). Drain mode pushes the
    watermark past every real event so the finite-input result equals
    the batch LEFT JOIN exactly — a true oracle for an outer stream
    join."""
    return click_purchase_left_join(spark, sf_dir, within_minutes=60)


@query(
    "stream_click_purchase_full_join",
    oracle="""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL '60 minutes'
    """,
)
def stream_click_purchase_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER watermarked stream-stream join — completes the
    inner/left/full family: unmatched CLICKS and unmatched PURCHASES
    both surface with NULLs, each gated on the opposite side's
    watermark (streaming/joins.click_purchase_full_join). Drain mode
    makes the finite-input result equal the batch FULL JOIN exactly —
    a true oracle for the hardest stream-join shape."""
    from bigdatafinalproject_spark.streaming.joins import click_purchase_full_join

    return click_purchase_full_join(spark, sf_dir, within_minutes=60)
