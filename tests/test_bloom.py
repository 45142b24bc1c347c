"""Explicit Bloom-filter join pruning (operators/bloom).

Three properties carry the operator:
1. soundness — pruning never drops a key that IS in the build set
   (prune == semi-join result plus false positives only);
2. effectiveness — false-positive rate on non-members stays near the
   textbook (1 - e^{-kn/m})^k bound;
3. portability — the word table is bit-for-bit reproducible by an
   independent pure-Python md5 replay (the property that lets DuckDB
   or any external system rebuild the identical filter).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.bloom import (
    WORD_BITS,
    bloom_build_words,
    bloom_prune,
)
from tests.conftest import SF_DIR

M_BITS, K = 8192, 4


def _py_hash64(value, seed: int) -> int:
    digest = hashlib.md5(f"{seed}|{value}".encode()).hexdigest()
    return int(digest[:15], 16)


def _py_words(keys, m_bits=M_BITS, k=K, seed=0):
    # Kirsch-Mitzenmacher double hashing from ONE base hash, mirroring
    # operators/bloom._positions exactly
    words: dict[int, int] = {}
    for key in keys:
        h = _py_hash64(key, seed)
        h1 = h % m_bits
        h2 = ((h // m_bits) % (m_bits // 2)) * 2 + 1
        for j in range(k):
            pos = (h1 + j * h2) % m_bits
            idx, bit = pos // WORD_BITS, pos % WORD_BITS
            words[idx] = words.get(idx, 0) | (1 << bit)
    return words


def test_build_words_match_pure_python_replay(spark):
    p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") == 15)
    got = {
        r.word_idx: r.word
        for r in bloom_build_words(p, "p_partkey", M_BITS, K, hash_fn="md5").collect()
    }
    keys = [r.p_partkey for r in p.select("p_partkey").collect()]
    assert len(keys) > 0
    assert got == _py_words(keys)


def test_prune_is_sound_and_effective(spark):
    p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    pruned = bloom_prune(li, "l_partkey", p, "p_partkey", M_BITS, K)

    members = {r.p_partkey for r in p.collect()}
    kept = [r.l_partkey for r in pruned.collect()]
    # soundness: every true member row survives
    true_rows = li.join(
        p, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    ).count()
    assert sum(1 for x in kept if x in members) == true_rows

    # effectiveness: false-positive rate over non-member keys near the
    # textbook bound (1 - e^{-kn/m})^k, with slack for hash variance
    non_member_keys = {
        r.l_partkey for r in li.distinct().collect()
    } - members
    fp = sum(1 for x in set(kept) - members if x in non_member_keys)
    if non_member_keys:
        bound = (1 - math.exp(-K * len(members) / M_BITS)) ** K
        assert fp / len(non_member_keys) <= max(5 * bound, 0.02)


def test_prune_then_join_equals_plain_join(spark):
    """The query-level oracle property, checked engine-side too."""
    p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pruned = bloom_prune(li, "l_partkey", p, "p_partkey", M_BITS, K)
    a = (
        pruned.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .count()
    )
    b = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .count()
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_persisted_words_prune_identically(spark, tmp_path):
    """Cross-job reuse: words written to parquet and reloaded in a
    fresh plan prune exactly the rows the in-process filter prunes
    (bit-identical words => identical probe verdicts)."""
    from bigdatafinalproject_spark.operators.bloom import (
        bloom_prune_with_words,
    )

    p = load_table(spark, SF_DIR, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    words = bloom_build_words(p, "p_partkey", M_BITS, K)
    store = str(tmp_path / "bloom_words")
    words.write.mode("overwrite").parquet(store)

    reloaded = spark.read.parquet(store)
    a = sorted(
        r.l_partkey
        for r in bloom_prune_with_words(
            li, "l_partkey", reloaded, M_BITS, K
        ).collect()
    )
    b = sorted(
        r.l_partkey
        for r in bloom_prune(li, "l_partkey", p, "p_partkey", M_BITS, K).collect()
    )
    assert len(a) > 0
    assert a == b
    # the persisted form is the bounded one: <= m_bits/32 rows
    assert spark.read.parquet(store).count() <= M_BITS // WORD_BITS


def test_merged_words_equal_union_build_and_pin_fp_rate(spark):
    """union + re-bit_or over two shard builds == one build over the
    union corpus (bit-for-bit), and the merged filter's FP rate stays
    near the textbook bound for the COMBINED member count."""
    from bigdatafinalproject_spark.operators.bloom import (
        bloom_merge_words,
        bloom_prune_with_words,
    )

    part = load_table(spark, SF_DIR, "part")
    s1 = part.filter(F.col("p_size") == 15)
    s2 = part.filter(F.col("p_size") == 23)
    w1 = bloom_build_words(s1, "p_partkey", M_BITS, K, hash_fn="md5")
    w2 = bloom_build_words(s2, "p_partkey", M_BITS, K, hash_fn="md5")
    merged = {
        r.word_idx: r.word for r in bloom_merge_words(w1, w2).collect()
    }
    both = part.filter(F.col("p_size").isin(15, 23))
    onebuild = {
        r.word_idx: r.word
        for r in bloom_build_words(
            both, "p_partkey", M_BITS, K, hash_fn="md5"
        ).collect()
    }
    assert merged == onebuild

    members = {r.p_partkey for r in both.select("p_partkey").collect()}
    assert len(members) > 0
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey")
    kept = {
        r.l_partkey
        for r in bloom_prune_with_words(
            li.distinct(),
            "l_partkey",
            bloom_merge_words(w1, w2),
            M_BITS,
            K,
            hash_fn="md5",
        ).collect()
    }
    non_members = {r.l_partkey for r in li.distinct().collect()} - members
    fp = len(kept - members)
    bound = (1 - math.exp(-K * len(members) / M_BITS)) ** K
    assert fp / max(len(non_members), 1) <= max(5 * bound, 0.02)
