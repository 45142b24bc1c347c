"""Explicit Bloom-filter join pruning (runtime semi-join filter).

Spark injects runtime bloom filters on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` — evidenced in
tests/test_runtime_filters.py), but only where the optimizer's
heuristics fire, and never across the places a pipeline most wants
one: ahead of an expensive Python/Arrow stage, into a streaming
micro-batch, or persisted between jobs. This operator is the explicit,
engine-independent version: a bounded bit array the caller builds from
the small side and applies to the big side BEFORE its shuffle.

Scale design (the part that matters at 100 TB):

1. **Build** never leaves the executors and never materializes the key
   set: each key sets k bit positions, the positions fold into 32-bit
   words with a ``bit_or`` partial+final aggregate, so the build
   output is <= m/32 rows REGARDLESS of build-side cardinality.
2. The word table collapses into a ONE-ROW map (``map_from_entries``
   over ``collect_list`` — bounded by construction) and rides a
   broadcast cross join, the same broadcast-scalar pattern the TPC-H
   queries use. No driver collect anywhere in the plan.
3. **Probe** is a row-local predicate that whole-stage-codegens into
   the scan stage — the pruned rows never reach the join's exchange,
   which is the entire point: shuffle volume drops by the filter's
   selectivity.
4. Hashing is ONE hash per row, not k: the k positions derive from
   the base hash by Kirsch–Mitzenmacher double hashing
   (pos_j = (h1 + j*h2) mod m with an odd stride h2), which preserves
   the asymptotic false-positive rate. The default base hash is
   codegen'd xxhash64 (the probe then costs ~2x a bare scan); pass
   hash_fn="md5" when an external system must rebuild the identical
   filter.
5. No false negatives by construction, so pruning is sound: a prune ->
   exact-join plan returns exactly the plain join's rows (that
   equivalence IS the query-level oracle). False positives only cost
   shuffle bytes; the rate for m bits / k hashes / n keys is the
   textbook (1 - e^{-kn/m})^k, pinned in tests.

Portability: words use 32 active bits in a signed 64-bit lane (no
sign-bit traffic). With ``hash_fn="md5"`` the base hash is the repo's
portable ``portable_hash64`` and an external system (or the
pure-Python replay test) rebuilds the identical filter from the same
inputs; the xxhash64 default trades that replayability for probe
speed — soundness is hash-independent either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import portable_hash64

WORD_BITS = 32


def _positions(m_bits: int, k: int) -> list[Column]:
    """k bit positions from one base hash (Kirsch–Mitzenmacher):
    h1 = h mod m, h2 = odd stride from the next hash bits,
    pos_j = (h1 + j*h2) mod m. Reads the column named ``_h`` (integer
    DIV must run in int64 — a double divide would lose exactness past
    2^53)."""
    h1 = F.pmod(F.col("_h"), F.lit(m_bits))
    h2 = F.pmod(F.expr(f"_h DIV {m_bits}"), F.lit(m_bits // 2)) * 2 + 1
    return [F.pmod(h1 + j * h2, F.lit(m_bits)) for j in range(k)]


def _base_hash(col: Column, seed: int, hash_fn: str) -> Column:
    """Non-negative 60-ish-bit base hash. ``xxhash64`` (default) is the
    JVM-side hot path — one codegen'd hash per row, ~20x cheaper than
    md5; ``md5`` is the portable variant an external system (or the
    pure-Python replay test, or a DuckDB CTE) can reproduce. Both are
    deterministic across runs and partitionings."""
    if hash_fn == "xxhash64":
        # MASK the sign bit away (not abs: abs(Long.MIN_VALUE) is
        # still negative under two's complement) so the non-negative
        # invariant _positions assumes holds unconditionally
        return F.xxhash64(F.lit(str(seed)), col).bitwiseAND(
            F.lit(0x7FFFFFFFFFFFFFFF)
        )
    if hash_fn == "md5":
        return portable_hash64(col, seed=seed)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def bloom_build_words(
    df: DataFrame,
    key: str | Column,
    m_bits: int = 8192,
    k: int = 4,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Aggregate the build side's keys into Bloom words.

    Returns <= ``m_bits // 32`` rows of (word_idx int, word long) —
    the operator's mergeable, persistable form (union two builds and
    re-``bit_or`` to merge corpora; write to parquet to reuse across
    jobs).
    """
    assert m_bits % WORD_BITS == 0
    col = F.col(key) if isinstance(key, str) else key
    hashed = df.select(_base_hash(col, seed, hash_fn).alias("_h"))
    bits = hashed.select(
        F.explode(F.array(*_positions(m_bits, k))).alias("_pos")
    ).select(
        (F.col("_pos") / WORD_BITS).cast("int").alias("word_idx"),
        (F.col("_pos") % WORD_BITS).cast("int").alias("_bit"),
    )
    # shiftleft needs a literal amount (NOTES.md) — F.expr takes the
    # column form
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")
    return (
        bits.select("word_idx", mask.alias("_mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_might_contain(
    words_map: Column,
    m_bits: int,
    k: int,
) -> Column:
    """Row-local membership predicate against a map<int,long> of words.
    Reads the precomputed base-hash column ``_h``, so the hash
    evaluates once per row however large k is."""
    tests = []
    for pos in _positions(m_bits, k):
        word = F.coalesce(
            F.element_at(words_map, (pos / WORD_BITS).cast("int")),
            F.lit(0).cast("long"),
        )
        # mask = 2^bit: shiftleft needs a LITERAL amount (NOTES.md), so
        # the column-shift goes through pow — exact in IEEE doubles for
        # bit <= 31, which is why words carry 32 active bits
        bit = (pos % WORD_BITS).cast("double")
        mask = F.pow(F.lit(2.0), bit).cast("long")
        tests.append(word.bitwiseAND(mask) != 0)
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return cond


def bloom_merge_words(*words_dfs: DataFrame) -> DataFrame:
    """Merge Bloom word tables built with the SAME (m_bits, k, seed,
    hash_fn): union + re-``bit_or``. Because set-bit union is exactly
    what inserting both key sets into one filter produces, the merged
    table is bit-identical to a single build over the union of the
    corpora — the property that makes per-shard / per-day builds
    composable without re-reading history."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), words_dfs)
    return u.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_prune_with_words(
    df: DataFrame,
    key: str | Column,
    words: DataFrame,
    m_bits: int = 8192,
    k: int = 4,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Probe side of the Bloom prune against a PREBUILT word table —
    the cross-job path: build once with :func:`bloom_build_words`,
    persist the <= m_bits/32 (word_idx, word) rows to parquet, reload
    in any later job and prune with the same (m_bits, k, seed,
    hash_fn). The words fold into a single-row map that rides a
    broadcast cross join (no driver collect)."""
    packed = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bloom")
    )
    col = F.col(key) if isinstance(key, str) else key
    pruned = (
        df.withColumn("_h", _base_hash(col, seed, hash_fn))
        .crossJoin(F.broadcast(packed))
    )
    return pruned.filter(
        bloom_might_contain(F.col("_bloom"), m_bits, k)
    ).drop("_bloom", "_h")


def bloom_prune(
    df: DataFrame,
    key: str | Column,
    build_df: DataFrame,
    build_key: str | Column,
    m_bits: int = 8192,
    k: int = 4,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` might appear in
    ``build_df[build_key]`` — sound (no false negatives), bounded-size
    broadcast, probe fully codegen'd with one hash per row. One-job
    convenience over build + :func:`bloom_prune_with_words`."""
    words = bloom_build_words(build_df, build_key, m_bits, k, seed, hash_fn)
    return bloom_prune_with_words(df, key, words, m_bits, k, seed, hash_fn)
