"""Property tests (FIXTURES.md §6): the guarantees the reference's
pipelines rely on, asserted against the engine's operators.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.ann import cosine_topk, lsh_topk
from bigdatafinalproject_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from bigdatafinalproject_spark.operators.ids import dense_ids
from bigdatafinalproject_spark.operators.recommend import assemble_topn
from bigdatafinalproject_spark.operators.splits import (
    add_kfold,
    cold_start_filter,
    leave_n_out,
)
from tests.conftest import SF_DIR


def test_dense_ids_dense_bijective_deterministic(spark):
    """FIXTURES §6.2: ids are 0..N-1, bijective, and invariant to the
    partition count (the scalability property the reference's global
    window traded away)."""
    c = load_table(spark, SF_DIR, "customer")
    for parts in (2, 7):
        m = dense_ids(c, "c_name", id_col="id", num_partitions=parts).collect()
        ids = sorted(r["id"] for r in m)
        assert ids == list(range(len(m))), "ids must be dense 0..N-1"
        by_key = sorted(m, key=lambda r: r["c_name"])
        assert [r["id"] for r in by_key] == list(range(len(m))), (
            "ids must follow natural-key order"
        )


def test_dense_ids_stable_across_evaluations_and_cache(spark):
    """Regression: repartitionByRange samples boundaries per evaluation;
    without freezing the partitioning, a cached upstream broke exchange
    reuse and the offsets join silently dropped rows. The mapping must
    be identical on every evaluation and complete after a join-back."""
    c = load_table(spark, SF_DIR, "customer").cache()
    c.count()
    m = dense_ids(c, "c_name", id_col="id", num_partitions=8)
    first = sorted(map(tuple, m.collect()))
    second = sorted(map(tuple, m.collect()))
    assert first == second
    joined_back = c.join(m, on="c_name", how="inner").count()
    assert joined_back == c.count()
    c.unpersist()


def test_kfold_balance_and_eligibility(spark):
    """FIXTURES §6.3: eligible users' folds balanced within 1; users
    below min_ratings always fold -1; same seed => same split."""
    o = load_table(spark, SF_DIR, "orders")
    f1 = add_kfold(o, "o_custkey", "o_orderkey", k=5, min_ratings=7, seed=42)
    per_user = (
        f1.filter(F.col("fold") >= 0)
        .groupBy("o_custkey", "fold")
        .count()
        .groupBy("o_custkey")
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .filter(F.col("mx") - F.col("mn") > 1)
        .count()
    )
    assert per_user == 0, "per-user fold sizes must be balanced within 1"

    small_users = (
        o.groupBy("o_custkey").count().filter(F.col("count") < 7).select("o_custkey")
    )
    bad = (
        f1.join(small_users, "o_custkey", "left_semi")
        .filter(F.col("fold") != -1)
        .count()
    )
    assert bad == 0, "sub-threshold users must be fold=-1 (always train)"

    f2 = add_kfold(o, "o_custkey", "o_orderkey", k=5, min_ratings=7, seed=42)
    assert f1.exceptAll(f2).count() == 0 and f2.exceptAll(f1).count() == 0


def test_leave_n_out_counts(spark):
    """FIXTURES §6.3: exactly min(n, user rows) test rows per user."""
    o = load_table(spark, SF_DIR, "orders")
    s = leave_n_out(o, "o_custkey", "o_orderkey", n=2, seed=7)
    per_user = (
        s.groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n_test") != F.least(F.lit(2), F.col("n")))
        .count()
    )
    assert per_user == 0


def test_cold_start_filter_containment(spark):
    """FIXTURES §6.4: filtered test contains only train-seen users/items."""
    li = load_table(spark, SF_DIR, "lineitem")
    s = leave_n_out(li, "l_suppkey", "l_partkey", n=3, seed=1)
    test = s.filter(F.col("split") == "test")
    train = s.filter(F.col("split") == "train")
    filtered = cold_start_filter(test, train, "l_suppkey", "l_partkey")
    unseen_u = filtered.join(
        train.select("l_suppkey").distinct(), "l_suppkey", "left_anti"
    ).count()
    unseen_i = filtered.join(
        train.select("l_partkey").distinct(), "l_partkey", "left_anti"
    ).count()
    assert unseen_u == 0 and unseen_i == 0


def test_assemble_topn_guarantees(spark):
    """FIXTURES §6.6: exactly n per user, no per-user duplicates,
    backfill only from the pool."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    spend = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .agg(F.sum("l_extendedprice").alias("s"))
    )
    pool = (
        li.groupBy(F.col("l_partkey").alias("i"))
        .count()
        .withColumn(
            "pool_rank",
            F.row_number().over(W.orderBy(F.col("count").desc(), F.col("i"))),
        )
        .filter(F.col("pool_rank") <= 10)
        .select("i", "pool_rank")
    )
    wide = assemble_topn(spend, pool, user_col="u", item_col="i", score_col="s",
                         n=5, keep=3)
    rec_cols = [f"rec_{k}" for k in range(1, 6)]
    rows = wide.collect()
    assert rows, "assembly produced no users"
    for r in rows:
        recs = [r[c] for c in rec_cols]
        assert all(v is not None for v in recs), f"user {r['u']} not padded to 5"
        assert len(set(recs)) == 5, f"user {r['u']} has duplicate recs"


def test_lsh_candidates_cover_high_jaccard_pairs(spark):
    """FIXTURES §6.7 analogue: every pair with very high (DF-filtered)
    jaccard must be recalled by the MinHash LSH banding."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = set(
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=8, threshold=0.95)
        .select("id_a", "id_b")
        .collect()
    )
    cand = set(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, "text", "doc_id", n=8).collect()
    )
    missed = exact - cand
    assert not missed, f"LSH missed {len(missed)} of {len(exact)} 0.95-pairs"


def test_lsh_topk_matches_exact_on_matched_pairs(spark):
    """LSH top-k cosines equal brute-force cosines for every pair both
    return (approximation affects recall, never the scored values)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in lsh_topk(emb, queries, k=10).collect()
    }
    shared = set(exact) & set(approx)
    assert shared, "no overlap between exact and LSH top-k"
    for k in shared:
        assert exact[k] == approx[k]


def test_lsh_multiprobe_recall_and_candidate_bound(spark):
    """The registered LSH parameterization (42 planes / 7 bands /
    multiprobe@1, queries/ann.py — r9 retune) must deliver mean
    recall@10 >= 0.8 on the sf0.01 panel (measured 0.86; the VERDICT
    r8 #6 bar is >= 0.85 across the RECALL_SCALE span) while
    generating at most 0.65x the brute-force Q*(N-1) pair count
    (measured ~0.56N/query: on this ISOTROPIC corpus the numpy-
    calibrated frontier needs ~0.5N candidates for >= 0.85 recall at
    any fixed-r banding — see the _LSH_PLANES tiering note; the
    recall is bought with query-side probes, never a dense join)."""
    from bigdatafinalproject_spark.operators.ann import lsh_candidates
    from bigdatafinalproject_spark.queries.ann import (
        _LSH_BANDS,
        _LSH_PLANES,
    )
    from bigdatafinalproject_spark.registry import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    n = emb.count()
    q = queries.count()
    n_cand = lsh_candidates(
        emb, queries, num_planes=_LSH_PLANES, bands=_LSH_BANDS,
        multiprobe=1,
    ).count()
    assert n_cand <= 0.65 * q * (n - 1), (n_cand, q, n)
    recall = QUERIES["ann_lsh_recall"](spark, sf_dir).agg(
        F.avg("recall")
    ).collect()[0][0]
    assert recall >= 0.8, recall


def test_quantized_topk_recall_and_exact_scores(spark):
    """Int8 quantization is an approximation of the SCAN ordering only:
    (a) returned cosines are exact (bit-equal to brute force for shared
    pairs, because the rerank recomputes them in float), and (b) with a
    4x rerank margin the two-stage result recalls nearly all of the
    true top-10 (64-dim vectors, ~0.4% per-component quantization
    error)."""
    from bigdatafinalproject_spark.operators.ann import quantized_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in quantized_topk(emb, queries, k=10, rerank=4).collect()
    }
    shared = set(exact) & set(quant)
    for key in shared:
        assert exact[key] == quant[key]
    recall = len(shared) / len(exact)
    assert recall >= 0.9, f"quantized recall@10 = {recall:.3f}"


def test_connected_components_chain_clique_singleton_pair(spark):
    """Min-label propagation: a diameter-3 chain (forces multiple
    rounds), a triangle, and an isolated pair all label with their
    component minimum; result is partitioning-independent."""
    from bigdatafinalproject_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    for parts in (1, 7):
        comp = {
            r["node"]: r["component"]
            for r in connected_components(edges.repartition(parts)).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                        10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_path_logarithmic_rounds(spark):
    """Large-star/small-star converges in O(log n) rounds: a 64-node
    path (diameter 63) must finish in <= 8 rounds — min-label
    propagation would need 63 and blow the 20-round default. Also
    checked on a shuffled-id path (no monotone-chain shortcut)."""
    import random

    from bigdatafinalproject_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    stats = {}
    comp = {
        r["node"]: r["component"]
        for r in connected_components(chain, stats=stats).collect()
    }
    assert comp == {i: 1 for i in range(1, 65)}
    assert stats["rounds"] <= 8, stats

    random.seed(7)
    perm = list(range(1, 65))
    random.shuffle(perm)
    shuffled = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(63)], "id_a long, id_b long"
    )
    stats = {}
    comp = {
        r["node"]: r["component"]
        for r in connected_components(shuffled, stats=stats).collect()
    }
    assert all(v == 1 for v in comp.values()) and len(comp) == 64
    assert stats["rounds"] <= 8, stats


def test_connected_components_raises_when_not_converged(spark):
    import pytest as _pytest

    from bigdatafinalproject_spark.operators.components import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=1)


def test_pack_sequences_capacity_and_determinism(spark):
    """Greedy packing: no bin exceeds capacity unless it holds a single
    oversized doc; bins are contiguous from 0 per shard; output is
    identical across input partitionings."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.operators.packing import pack_sequences

    rows = [(i, (i * 37) % 300 + 1) for i in range(1, 400)]
    rows.append((1000, 900))  # oversized doc (> capacity)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")

    def run(parts):
        return sorted(
            map(
                tuple,
                pack_sequences(
                    df.repartition(parts), "doc_id", "n_tokens",
                    capacity=256, num_shards=4,
                ).collect(),
            )
        )

    a = run(1)
    assert a == run(13), "packing must not depend on input partitioning"

    out = spark.createDataFrame(
        [tuple(r) for r in a], "doc_id long, shard int, bin int, tok int"
    )
    fills = out.groupBy("shard", "bin").agg(
        F.sum("tok").alias("fill"), F.count("*").alias("n_docs")
    )
    bad = fills.filter((F.col("fill") > 256) & (F.col("n_docs") > 1)).count()
    assert bad == 0, "multi-doc bin over capacity"
    # bins contiguous per shard
    per_shard = fills.groupBy("shard").agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi"),
        F.countDistinct("bin").alias("nb"),
    )
    assert per_shard.filter(
        (F.col("lo") != 0) | (F.col("nb") != F.col("hi") + 1)
    ).count() == 0


def test_resample_ffill_spine_complete_and_filled(spark):
    """The resampled series has every bucket between each key's min and
    max (no holes), v_fill is never NULL, and the non-gap buckets
    preserve the original per-bucket event counts exactly."""
    from bigdatafinalproject_spark.functions import dsum
    from bigdatafinalproject_spark.operators.timeseries import resample_ffill

    e = load_table(spark, SF_DIR, "events")
    out = resample_ffill(e, "ts", ["event_type"], dsum(F.col("value")), unit="hour")
    rows = out.collect()
    assert all(r["v_fill"] is not None for r in rows)
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r)
    total_events = 0
    for _, krows in by_key.items():
        buckets = sorted(r["bucket"] for r in krows)
        # spine completeness: consecutive buckets are exactly 1 h apart
        diffs = {
            (b2 - b1).total_seconds() for b1, b2 in zip(buckets, buckets[1:])
        }
        assert diffs <= {3600.0}
        assert all(r["n_events"] == 0 for r in krows if r["was_gap"] == 1)
        total_events += sum(r["n_events"] for r in krows)
    assert total_events == e.count(), "resample must not lose or invent events"


def test_grouped_split_is_constant_per_group(spark):
    """Every group key maps to exactly ONE split (the leakage guard),
    and all three splits are non-degenerate on enough groups."""
    from bigdatafinalproject_spark.operators.features import grouped_split

    d = load_table(spark, SF_DIR, "documents")
    out = d.select("source", grouped_split(d, "source").alias("split"))
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_group.filter(F.col("k") > 1).count() == 0
    assert out.select("split").distinct().count() >= 2


def test_standardize_moments(spark):
    """z-scores have ~zero mean and ~unit variance per group; minmax
    lands in [0, 1] with both endpoints attained."""
    from bigdatafinalproject_spark.operators.features import standardize

    li = load_table(spark, SF_DIR, "lineitem").select("l_returnflag", "l_quantity")
    out = standardize(li, "l_quantity", ["l_returnflag"])
    stats = out.groupBy("l_returnflag").agg(
        F.avg("z").alias("mz"),
        F.stddev_samp("z").alias("sz"),
        F.min("minmax").alias("lo"),
        F.max("minmax").alias("hi"),
    )
    for r in stats.collect():
        assert abs(r["mz"]) < 1e-9
        assert abs(r["sz"] - 1.0) < 1e-6
        assert r["lo"] == 0.0 and r["hi"] == 1.0


def test_hashed_bow_conserves_tokens_and_dim(spark):
    """Slot counts conserve the total token count, and every slot is in
    [0, dim)."""
    from bigdatafinalproject_spark.operators.features import hashed_bow
    from bigdatafinalproject_spark.operators.text import tokens

    d = load_table(spark, SF_DIR, "documents")
    out = hashed_bow(d, "text", "doc_id", dim=16)
    assert out.filter((F.col("slot") < 0) | (F.col("slot") >= 16)).count() == 0
    total = out.agg(F.sum("cnt")).collect()[0][0]
    expect = d.select(F.size(tokens(F.col("text"))).alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    assert total == expect


def test_mmr_diversify_structure_and_diversification(spark):
    """MMR invariants: pick 1 is the plain relevance argmax; picks are
    distinct candidates; mmr_q is non-increasing across steps for each
    query (greedy maximality over a shrinking frontier with a growing
    penalty); and on at least one query the diversified panel differs
    from the plain top-k (the penalty actually re-ranks)."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.operators.ann import (
        cosine_topk,
        mmr_diversify,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = mmr_diversify(emb, queries, n_candidates=12, k=4).collect()
    top = cosine_topk(emb, queries, k=12).collect()

    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    top_by_q = {}
    for r in top:
        top_by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))

    assert set(by_q) == set(top_by_q)
    diverged = 0
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.pick)
        ids = [r.vec_id for r in rows]
        assert len(set(ids)) == 4
        ranked = [n for _, n in sorted(top_by_q[qid])]
        # pick 1 == relevance argmax (quantized ties break on low id)
        assert ids[0] == ranked[0]
        assert set(ids) <= set(ranked)
        mmrs = [r.mmr_q for r in rows]
        assert all(a >= b for a, b in zip(mmrs, mmrs[1:]))
        if ids != ranked[:4]:
            diverged += 1
    assert diverged > 0


def test_negative_samples_are_unseen_and_exactly_k(spark):
    """Every sampled (user, item) must be absent from the user's seen
    set, each panel user gets exactly k ranked negatives, and the
    output is deterministic across invocations."""
    from pyspark.sql import functions as F

    from bigdatafinalproject_spark import registry
    from bigdatafinalproject_spark.catalog import load_table

    neg = registry.QUERIES["ratings_negative_samples"](spark, SF_DIR)
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    seen = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("userId"), F.col("l_partkey").alias("itemId"))
        .distinct()
    )
    assert neg.join(seen, ["userId", "itemId"], "inner").count() == 0
    per_user = {r.userId: r["count"] for r in neg.groupBy("userId").count().collect()}
    assert per_user and all(v == 5 for v in per_user.values())
    again = registry.QUERIES["ratings_negative_samples"](spark, SF_DIR)
    assert sorted(map(tuple, neg.collect())) == sorted(map(tuple, again.collect()))


def test_pq_topk_exact_scores_structure_and_recall(spark):
    """Product quantization approximates the CANDIDATE ordering only:
    (a) returned cosines are exact (the rerank recomputes them in
    float), (b) exactly 10 ranked rows per query with ranks 1..10,
    (c) recall vs brute force at sf0.01 stays above the measured-floor
    band (deterministic pipeline: measured 0.54 with 16 trainless
    codewords x 8 subspaces and 4x rerank on the random-vector
    corpus; pinned with slack for testdata regeneration)."""
    from bigdatafinalproject_spark.operators.ann import pq_topk

    mid = "/root/testdata/sf0.01"
    emb = load_table(spark, mid, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200))
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    pq_rows = pq_topk(emb, queries, k=10).collect()
    pq = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in pq_rows}
    per_q: dict[int, list[int]] = {}
    for r in pq_rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())
    shared = set(exact) & set(pq)
    for key in shared:
        assert exact[key] == pq[key]
    recall = len(shared) / len(exact)
    assert recall >= 0.4, f"pq recall@10 = {recall:.3f}"


def test_ann_sampling_is_offset_robust(spark):
    """IVF centroids and PQ codebooks are sampled RELATIVE to min(id),
    so a corpus whose ids start far above 0 (e.g. a snowflake-id key
    space) still yields a full index — the absolute-id-range form
    silently produced ZERO centroids/codewords and empty results (the
    key-space-convention bug class ratings_negative_samples fixed).
    Shifting every id by a constant must shift results by exactly that
    constant."""
    from bigdatafinalproject_spark.operators.ann import ivf_topk, pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    shift = 1_000_000
    shifted = emb.withColumn("vec_id", F.col("vec_id") + shift)
    q0 = emb.filter(F.col("vec_id") % 50 == 0)
    qs = shifted.filter((F.col("vec_id") - shift) % 50 == 0)
    for op in (ivf_topk, pq_topk):
        base = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in op(emb, q0, k=10).collect()
        }
        assert base, f"{op.__name__}: empty baseline"
        got = {
            (r.query_id - shift, r.neighbor_id - shift, r.rank)
            for r in op(shifted, qs, k=10).collect()
        }
        assert got == base, f"{op.__name__}: shifted corpus diverged"


def test_attribution_credit_is_conserved_to_the_micro_dollar(spark):
    """Largest-remainder allocation: attributed + unattributed credit
    must equal total purchase value EXACTLY in integer micro-dollars —
    no pennies created or destroyed by the per-touch split."""
    from bigdatafinalproject_spark import registry

    mid = "/root/testdata/sf0.01"
    out = registry.QUERIES["events_linear_attribution"](spark, mid)
    total_credit = out.agg(F.sum("credit_micro")).first()[0]
    e = load_table(spark, mid, "events")
    total_purchases = (
        e.filter(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long") * 10000)
        )
        .first()[0]
    )
    assert total_credit == total_purchases


def test_mass_probes_rule_hand_computed(spark):
    """Pin the mass-budget probe rule on a hand-built 3-cell frame:
    probe cosine-ranked cells until cumulative posting mass reaches
    ceil(num/den · T), INCLUSIVE of the crossing cell, per query.
    Covers: per-query adaptivity (same budget, different cell counts),
    the inclusive-crossing boundary, and the budget-covers-all case."""
    from bigdatafinalproject_spark.operators.ann import _mass_probes

    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]),
         (1, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id int, _cent array<float>",
    )
    # posting mass: c0=5, c1=3, c2=2 -> T=10
    sizes = spark.createDataFrame(
        [(0, 5), (1, 3), (2, 2)], "centroid_id int, _csz long"
    )
    # q100 ranks c0 > c1 > c2; q200 ranks c2 > c1 > c0
    queries = spark.createDataFrame(
        [(100, [0.9, 0.5, 0.1, 0.0]), (200, [0.1, 0.2, 0.9, 0.0])],
        "vec_id int, embedding array<float>",
    )

    def probes(num, den):
        rows = _mass_probes(
            centroids, queries, sizes, (num, den), "vec_id", "embedding"
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.centroid_id)
        return out

    # budget ceil(3/10·10)=3: q100 stops after c0 (cum 5 >= 3 at the
    # first cell); q200 needs c2 (cum 2 < 3) AND c1 (crossing cell,
    # included) — same budget, different probe counts
    assert probes(3, 10) == {100: {0}, 200: {2, 1}}
    # budget 6: q100 takes c0 then c1 (5 < 6, crossing at 8)
    assert probes(3, 5) == {100: {0, 1}, 200: {2, 1, 0}}
    # budget = T: every cell probed for every query
    assert probes(1, 1) == {100: {0, 1, 2}, 200: {0, 1, 2}}


def test_winnow_guarantee_and_negative(spark):
    """The MOSS winnowing theorem on hand-built docs (k=5, w=4 →
    guarantee threshold t = w + k - 1 = 8 tokens): two docs sharing an
    8-token run at DIFFERENT alignments must share >= 1 fingerprint;
    docs with no common 5-token gram must share none. Also pins the
    density bound loosely (fingerprints <= positions)."""
    from bigdatafinalproject_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_shared_spans,
    )

    shared_run = "s1 s2 s3 s4 s5 s6 s7 s8"  # exactly t = 8 tokens
    doc_a = f"a1 a2 a3 {shared_run} a4 a5"
    doc_b = f"b1 {shared_run} b2 b3 b4 b5 b6"   # different offset
    doc_c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"   # no shared gram
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id int, text string"
    )
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "guaranteed common fingerprint missing"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density sanity: selections cannot exceed gram positions
    n_pos_a = len(doc_a.split()) - 4
    assert len({(r.fp_pos, r.fp) for r in fps if r.doc_id == 1}) <= n_pos_a

    stats = {
        r.doc_id: r for r in winnow_shared_spans(
            df, "text", "doc_id", k=5, w=4
        ).collect()
    }
    assert stats[1].n_shared > 0 and stats[2].n_shared > 0
    assert stats[3].n_shared == 0 and stats[3].shared_frac == 0.0
    for r in stats.values():
        assert 0 < r.n_fp and 0.0 <= r.shared_frac <= 1.0


def test_winnow_dedup_drops_straddling_copy(spark):
    """The ACTING tier (r10 verdict #3): a later near-verbatim copy
    whose duplicated span sits at a DIFFERENT alignment — the case
    fixed-segment dedup structurally misses — is caught and dropped,
    the min-id original survives, a clean doc survives, and a short
    (< k tokens) doc is kept with zero fingerprints. Also pins the
    single-pass rule: a THIRD copy drops too even though the second
    (its nearest earlier copy) was itself dropped — dropped docs keep
    suppressing later copies, no fixpoint."""
    from bigdatafinalproject_spark.operators.dedup import winnow_dedup

    body = " ".join(f"w{i}" for i in range(1, 25))  # 24 shared tokens
    df = spark.createDataFrame(
        [
            (1, f"{body} o1 o2 o3"),          # the original (min id)
            (2, f"z1 z2 {body}"),             # shifted copy: drop
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),  # clean
            (4, "tiny doc here"),             # < k tokens: no fps
            (5, f"y1 {body} y2"),             # third copy: still drops
        ],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r
        for r in winnow_dedup(
            df, "text", "doc_id", k=5, w=4, max_dup_frac=0.5
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1].kept == 1 and rows[1].n_dup == 0
    assert rows[2].kept == 0 and rows[2].dup_frac > 0.5
    assert rows[3].kept == 1 and rows[3].n_dup == 0
    assert rows[4].kept == 1 and rows[4].n_fp == 0 and rows[4].dup_frac == 0.0
    assert rows[5].kept == 0, "single-pass: dropped doc 2 still suppresses"


def test_winnow_contamination_join_path(spark):
    """The benchmark-overlap join path of winnow_contamination on
    hand-built docs: a train doc sharing an 8-token span with the
    benchmark is flagged (n_hit >= 1); a clean train doc reads
    n_hit = 0 (the coalesce on the left-join flag), never NULL; the
    benchmark doc itself never appears in the output."""
    from bigdatafinalproject_spark.operators.dedup import (
        winnow_contamination,
    )
    from pyspark.sql import functions as F

    span = "q1 q2 q3 q4 q5 q6 q7 q8"  # 8 tokens = the guarantee bound
    df = spark.createDataFrame(
        [
            (1, f"bench intro {span} bench outro x y", "bench"),
            (2, f"t1 t2 {span} t3 t4 t5", "train"),       # contaminated
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "train"),  # clean
        ],
        "doc_id int, text string, src string",
    )
    rows = {
        r.doc_id: r
        for r in winnow_contamination(
            df, "text", "doc_id", F.col("src") == "bench", k=5, w=4
        ).collect()
    }
    assert set(rows) == {2, 3}
    assert rows[2].n_hit >= 1 and rows[2].hit_frac > 0.0
    assert rows[3].n_hit == 0 and rows[3].hit_frac == 0.0
    for r in rows.values():
        assert r.n_fp >= 1 and r.n_hit is not None
