"""Corpus-preparation operators a training-data pipeline needs between
cleaning and tokenization: context-window chunking and temperature-
scaled source mixing. Both are pure built-in expression plans (one scan
plus a tiny broadcast aggregate) — no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import oracle_hash64, portable_hash64
from bigdatafinalproject_spark.operators.text import STOPWORDS, tokens
from bigdatafinalproject_spark.registry import query

_CHUNK = 64
_STRIDE = 48
_MIX_SEED = 77
_MIX_MOD = 1_000_000

_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


@query(
    "doc_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t)
    SELECT doc_id,
           CAST((st - 1) // {_STRIDE} AS INT) AS chunk_idx,
           array_to_string(toks[st : st + {_CHUNK - 1}], ' ') AS chunk_text,
           CAST(LEAST({_CHUNK}, n - st + 1) AS INT) AS n_chunk_tokens
    FROM s, LATERAL unnest(generate_series(1, n, {_STRIDE})) AS u(st)
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap: each document split into
    {CHUNK}-token windows advancing {STRIDE} tokens (16-token overlap),
    the standard prep for fixed-context training and for embedding
    long documents.

    Plan shape: sequence() builds the start offsets per row, transform+
    slice assemble each window, posexplode emits (chunk_idx, chunk) —
    all inside whole-stage codegen on one scan, output rows ~= tokens/
    stride per doc. No shuffle at all: chunking is embarrassingly
    row-parallel and stays that way at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(_STRIDE))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s + 1, _CHUNK), " ").alias("txt"),
            F.least(F.lit(_CHUNK), n - s).alias("nt"),
        ),
    )
    return (
        d.select(F.col("doc_id"), F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.txt").alias("chunk_text"),
            F.col("c.nt").cast("int").alias("n_chunk_tokens"),
        )
    )


@query(
    "doc_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
    m AS (SELECT MIN(n_src) AS n_min FROM c),
    r AS (SELECT source, n_src,
                 CAST(FLOOR({_MIX_MOD} * sqrt(CAST(n_min AS DOUBLE)
                                              / CAST(n_src AS DOUBLE)))
                      AS BIGINT) AS keep_ppm
          FROM c, m)
    SELECT d.doc_id, d.source, r.keep_ppm
    FROM documents d JOIN r USING (source)
    WHERE {oracle_hash64('d.doc_id', seed=_MIX_SEED)} % {_MIX_MOD} < r.keep_ppm
    """,
)
def doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5): per-source keep
    rates proportional to n_src^(alpha-1), normalized so the smallest
    source keeps everything — the alpha-sampling scheme multilingual /
    multi-source training corpora use to up-weight small sources
    (published in the mC4/mT5 line of work). Deterministic keep
    decision via the portable doc_id hash, so the sample is
    reproducible across runs, engines, and partitionings.

    Plan shape: one tiny groupBy(source) aggregate joined back via
    broadcast (source cardinality is always small), then a pure filter
    on the scan — two passes over metadata-sized state, one over data.
    The rate formula is written with the same sqrt/divide/floor
    expression tree in both engines: IEEE-deterministic, no epsilon."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    n_min = counts.agg(F.min("n_src").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            "source",
            F.floor(
                F.lit(float(_MIX_MOD))
                * F.sqrt(F.col("n_min").cast("double") / F.col("n_src").cast("double"))
            )
            .cast("bigint")
            .alias("keep_ppm"),
        )
    )
    ppm = F.pmod(portable_hash64("doc_id", seed=_MIX_SEED), F.lit(_MIX_MOD))
    return (
        d.join(F.broadcast(rates), "source")
        .filter(ppm < F.col("keep_ppm"))
        .select("doc_id", "source", "keep_ppm")
    )


# linear quality-classifier weights (a stand-in for fastText-style
# model-based filtering: the real pipeline trains these; the ENGINE
# op is "score every doc with a linear model and threshold", which is
# what this exercises). Decision = z > 0 — deliberately NOT sigmoid:
# exp() differs between engines in the last ulp, a raw affine form
# with a fixed evaluation order is IEEE-identical.
_W0 = -1.2  # bias
_W_PUNCT = -3.0  # punctuation-heavy -> low quality
_W_SW = 2.5  # stopword-bearing prose -> high quality
_W_LEN = 1.5  # longer docs (capped) -> higher quality
_W_TTR = 0.8  # vocabulary diversity -> higher quality

_SW_EN_SQL = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@query(
    "doc_quality_classifier",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             length(text) AS raw_len,
             CAST(length(lower(text))
                  - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
                  AS DOUBLE) AS punct,
             string_split({_NORM}, ' ') AS toks
      FROM documents),
    f AS (
      SELECT doc_id,
             punct / raw_len AS punct_ratio,
             CAST(len(list_filter(toks, x -> x IN ({_SW_EN_SQL}))) AS DOUBLE)
                 / len(toks) AS sw_ratio,
             LEAST(len(toks) / 100.0, 1.0) AS len_feat,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
      FROM c)
    SELECT doc_id,
           {_W0} + {_W_PUNCT} * punct_ratio + {_W_SW} * sw_ratio
                 + {_W_LEN} * len_feat + {_W_TTR} * ttr AS z,
           CAST(({_W0} + {_W_PUNCT} * punct_ratio + {_W_SW} * sw_ratio
                 + {_W_LEN} * len_feat + {_W_TTR} * ttr) > 0 AS INT) AS keep
    FROM f
    """,
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a linear classifier over cheap
    text features (punctuation ratio, stopword ratio, capped length,
    type-token ratio) scored per document in one codegen'd scan — the
    engine-side shape of fastText/logreg quality filters in training
    pipelines (weights would come from offline training; scoring is the
    data-plane op and must run at corpus scale). No shuffle, no UDF;
    the affine form keeps the decision IEEE-portable (sigmoid is
    monotone, so z > 0 IS p > 0.5)."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.col("text")
    toks = tokens(raw)
    n = F.size(toks)
    punct = (
        F.length(F.lower(raw))
        - F.length(F.regexp_replace(F.lower(raw), "[^a-z0-9 ]", ""))
    ).cast("double")
    punct_ratio = punct / F.length(raw)
    sw_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))).cast("double") / n
    )
    len_feat = F.least(n / F.lit(100.0), F.lit(1.0))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    z = (
        F.lit(_W0)
        + F.lit(_W_PUNCT) * punct_ratio
        + F.lit(_W_SW) * sw_ratio
        + F.lit(_W_LEN) * len_feat
        + F.lit(_W_TTR) * ttr
    )
    return d.select(
        "doc_id", z.alias("z"), (z > 0).cast("int").alias("keep")
    )


_SHARD_SEED = 11
_N_SHARDS = 16


@query(
    "doc_shard_shuffle",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      {oracle_hash64('doc_id', seed=_SHARD_SEED)} AS hsh
               FROM documents)
    SELECT doc_id,
           CAST(hsh % {_N_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hsh % {_N_SHARDS}
                                   ORDER BY hsh, doc_id) AS INT) AS pos
    FROM h
    """,
)
def doc_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into {_N_SHARDS} equal-ish
    shards with a reproducible within-shard order — what a pretraining
    data loader consumes (epoch order must be shuffled AND identical
    across reruns/engines; the reference's orderBy(rand(seed)) is
    partition-dependent, ALS_model3.py:222 — this is the stable form).

    Plan shape: one hash projection, one shuffle on the shard id, one
    PARTITIONED window (each task ranks only its shard — never a global
    single-task sort). At 100 TB: shards stream straight to
    partitionBy('shard') writers.
    """
    d = load_table(spark, sf_dir, "documents")
    hsh = portable_hash64(F.col("doc_id"), seed=_SHARD_SEED)
    w = W.partitionBy("shard").orderBy("hsh", "doc_id")
    return (
        d.select("doc_id", hsh.alias("hsh"))
        .withColumn("shard", (F.col("hsh") % _N_SHARDS).cast("int"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("int").alias("pos"),
            "hsh",
        )
        .drop("hsh")
    )


_WS_K = 100
_WS_SEED = 31


@query(
    "doc_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             {oracle_hash64('doc_id', seed=_WS_SEED)} AS hk
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_chars,
             SUM(n_chars) OVER (ORDER BY hk, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM keyed),
    t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(({_WS_K} * cum) // w AS INT) AS pick
    FROM c, t
    WHERE ({_WS_K} * cum) // w > ({_WS_K} * (cum - n_chars)) // w
    """,
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k size-weighted corpus sample (systematic / Madow):
    pick 100 documents with probability proportional to n_chars — the
    "sample by token budget" primitive — in EXACT integer arithmetic
    (operators/sampling.weighted_systematic_sample). Pseudo-random
    order comes from the portable md5 hash, the cumulative-weight line
    from the distributed prefix sum (no single-task window), and the
    selection predicate is row-local against the broadcast total — so
    the same 100 documents come back on any engine, run, or partition
    count, which the oracle proves."""
    from bigdatafinalproject_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_systematic_sample(
        d, "n_chars", k=_WS_K, hash_cols=["doc_id"], seed=_WS_SEED
    )


_RAG_DIMS = 16
_RAG_K = 5
_RAG_QMOD = 199  # bounded query panel: first chunk of every 199th doc

_RAG_EMB_SQL = ", ".join(
    f"CAST(({oracle_hash64('chunk_text', seed=1300 + d)} % 2001) - 1000 "
    "AS DOUBLE)"
    for d in range(_RAG_DIMS)
)

_RAG_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "s -> s[1] * s[2]), (acc, x) -> acc + x)"
)


@query(
    "rag_chunk_retrieval",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    ch AS (
      SELECT doc_id,
             CAST((st - 1) // {_STRIDE} AS INT) AS chunk_idx,
             array_to_string(toks[st : st + {_CHUNK - 1}], ' ') AS chunk_text
      FROM s, LATERAL unnest(generate_series(1, n, {_STRIDE})) AS u(st)),
    e AS (
      SELECT doc_id * 1000 + chunk_idx AS uid, doc_id, chunk_idx,
             [{_RAG_EMB_SQL}] AS emb
      FROM ch),
    nrm AS (
      SELECT uid, doc_id, chunk_idx, emb,
             sqrt({_RAG_DOT.format(a='emb', b='emb')}) AS nm
      FROM e),
    q AS (SELECT * FROM nrm WHERE doc_id % {_RAG_QMOD} = 0 AND chunk_idx = 0),
    scored AS (
      SELECT q.uid AS quid, c.uid AS cuid,
             {_RAG_DOT.format(a='q.emb', b='c.emb')} / (q.nm * c.nm) AS cosine
      FROM q JOIN nrm c ON q.uid <> c.uid),
    ranked AS (
      SELECT quid, cuid, cosine,
             row_number() OVER (PARTITION BY quid
                                ORDER BY cosine DESC, cuid ASC) AS rank
      FROM scored)
    SELECT CAST(quid // 1000 AS BIGINT) AS query_doc,
           CAST(cuid // 1000 AS BIGINT) AS neighbor_doc,
           CAST(cuid % 1000 AS INT) AS neighbor_chunk,
           cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_RAG_K}
    """,
)
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-shaped retrieval end-to-end in ONE plan: chunk the corpus
    (64-token windows, 48 stride — doc_chunk_overlap's machinery),
    embed every chunk deterministically (16 md5-derived dims, the
    portable stand-in for a real encoder — the Spark-side plumbing is
    identical), and run exact cosine top-{_RAG_K} retrieval for a
    bounded query panel (first chunk of every {_RAG_QMOD}th doc)
    against the full chunk corpus.

    Scale story: chunking+embedding are row-local (no shuffle);
    retrieval is the brute-force tier of operators/ann.cosine_topk —
    query panel broadcast, corpus scanned once — and swaps to the
    lsh/ivf/quantized tiers unchanged when the corpus outgrows a scan.
    The whole pipeline hash-matches DuckDB, chunk text through
    cosine."""
    from bigdatafinalproject_spark.operators.ann import cosine_topk

    chunks = doc_chunk_overlap(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_text"
    )
    emb = F.array(
        *[
            (
                (portable_hash64(F.col("chunk_text"), seed=1300 + d) % 2001)
                - 1000
            ).cast("double")
            for d in range(_RAG_DIMS)
        ]
    )
    e = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("uid"),
        "doc_id",
        "chunk_idx",
        emb.alias("emb"),
    )
    q = e.filter((F.col("doc_id") % _RAG_QMOD == 0) & (F.col("chunk_idx") == 0))
    out = cosine_topk(e, q, id_col="uid", vec_col="emb", k=_RAG_K)
    return out.select(
        F.expr("query_id DIV 1000").alias("query_doc"),
        F.expr("neighbor_id DIV 1000").alias("neighbor_doc"),
        F.expr("CAST(neighbor_id % 1000 AS INT)").alias("neighbor_chunk"),
        "cosine",
        F.col("rank").cast("int").alias("rank"),
    )
