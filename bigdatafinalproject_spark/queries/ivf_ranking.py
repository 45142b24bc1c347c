"""IVF ANN variant + ranking-quality metrics (both oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.functions import oracle_hash64
from bigdatafinalproject_spark.operators.ann import ivf_topk
from bigdatafinalproject_spark.operators.ranking import ranking_metrics
from bigdatafinalproject_spark.operators.splits import leave_n_out
from bigdatafinalproject_spark.queries.ann import (
    _DOT_AB,
    _NORMS_CTE,
    _recall_oracle,
    recall_frame,
)
from bigdatafinalproject_spark.registry import query

_SEED = 42

# --- deterministic k-means training CTEs: shared Lloyd builder
# (queries/_lloyd_sql.py), full-vector mode ---

_IVF_MOD, _IVF_C, _IVF_ROUNDS = 37, 64, 2
_IVF_MULTI = 3

# r10 introduced the mass-budgeted probe; r11 made the whole policy
# ADAPTIVE (the r10 verdict's top item): the centroid count grows
# C = min(512, 64·ceil(sqrt(N/2000))) — classic IVF sizing — and the
# probe budget STEPS DOWN with the same scale step s per
# IVF_MASS_SCHEDULE ("auto"). numpy-calibrated across 5 scale points
# BEFORE the Spark change (scripts/ivf_centroid_calibration.py,
# IVF_CALIBRATION.json): recall@10 at the shipped operating points
# 0.955/0.972/0.958/0.956/0.958 (sf0.1→sf10), every point directly
# measured, while the unique-candidate serve mass falls 0.66N→0.37N
# at sf3+. The calibration also pins the honest frontier: recall at
# fixed candidate mass SATURATES in C on this isotropic corpus
# (C=256/512/640 all need ~3/20 posting mass for 0.95 at sf10), so
# sub-0.35N serve cost at 0.95 recall needs the compressed-domain
# scan — the IVFPQ tier. Constants live at the operator layer
# (circular-import rule); the oracle CTEs below replay the identical
# integer rules.
from bigdatafinalproject_spark.operators.ann import (
    IVF_CENTROID_CAP,
    IVF_PROBE_MASS,
    IVF_SCALE_REF,
    ivf_mass_schedule_sql,
)

_IVF_MASS = IVF_PROBE_MASS  # "auto": the scheduled policy


def _scaled_c_sql(base_pred: str) -> str:
    """The oracle's rendering of the in-plan centroid-count rule:
    C = min(cap, base · ceil(sqrt(N / scale_ref))) with N counted
    under ``base_pred`` — the same IEEE-double sqrt/ceil both engines
    evaluate identically (operators/ann.ivf_centroids)."""
    n = f"(SELECT COUNT(*) FROM embeddings WHERE {base_pred})"
    return (
        f"LEAST({IVF_CENTROID_CAP}, {_IVF_C} * "
        f"CAST(ceil(sqrt({n} / {IVF_SCALE_REF}.0)) AS BIGINT))"
    )


def _kmeans_ctes(
    rounds: int, base_pred: str = "TRUE", scaled: bool = False
) -> str:
    """CTE chain kc0 -> kc{rounds}: Lloyd updates over the embeddings
    table from the sampled-centroid init (one assign + one decimal-mean
    update per round, both bit-portable). ``base_pred`` restricts init
    sampling AND training to a base subset (the train-on-base mode of
    the incremental-maintenance oracle). ``scaled`` switches the init
    cap from the fixed 64 (the IVFPQ coarse quantizer) to the r11
    corpus-scaled count (the IVF tier)."""
    from bigdatafinalproject_spark.queries._lloyd_sql import lloyd_ctes

    base_min = f"(SELECT MIN(vec_id) FROM embeddings WHERE {base_pred})"
    cap = _scaled_c_sql(base_pred) if scaled else str(_IVF_C)
    init = f"""
    kc0 AS (SELECT vec_id AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
            FROM embeddings
            WHERE ({base_pred})
              AND (vec_id - {base_min}) % {_IVF_MOD} = 0
              AND (vec_id - {base_min}) < {_IVF_MOD} * ({cap}))"""
    return lloyd_ctes(
        rounds,
        prefix="k",
        init_cte=init,
        vec_expr="e.embedding",
        val_expr="CAST(e.embedding[u.i] AS DOUBLE)",
        dims_expr="len(e.embedding)",
        source=f"(SELECT * FROM embeddings WHERE {base_pred})",
    )


def _ivf_oracle(kmeans_ctes: str, base_pred: str = "TRUE") -> str:
    """Full IVF search oracle over a given trained-centroid CTE chain
    (assign ALL embeddings under multi-assignment, probe the panel,
    exact rerank). The probe budget replays the scheduled policy with
    the r12 CLAMP (ADVICE r11): the scale step s comes from the BASE
    count — the corpus C was sized on, the serve side's manifest
    base_rows — never the live posting total, so appends cannot step
    the budget fraction down against a frozen C; the budget
    ceil(num·T/den) still tracks the LIVE total T. (num, den) from
    the SHARED IVF_MASS_SCHEDULE rendering, same integer arithmetic
    as the Spark plan. With base_pred TRUE the clamp coincides with
    the r11 posting-total definition (T/multi == N)."""
    num_case, den_case = ivf_mass_schedule_sql("s")
    return f"""
    WITH {_NORMS_CTE},
    {kmeans_ctes},
    cents AS (SELECT cid AS centroid_id, centroid AS cemb,
                     sqrt({_DOT_AB.format(a='centroid', b='centroid')}) AS cnrm
              FROM kc{_IVF_ROUNDS}),
    acos AS (SELECT e.vec_id, c.centroid_id,
                    {_DOT_AB.format(a='e.embedding', b='c.cemb')}
                        / (ne.nrm * c.cnrm) AS cs
             FROM embeddings e CROSS JOIN cents c
             JOIN norms ne ON ne.vec_id = e.vec_id),
    ranked AS (SELECT vec_id, centroid_id,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cs DESC, centroid_id) AS rn
               FROM acos),
    assign AS (SELECT vec_id AS neighbor_id, centroid_id
               FROM ranked WHERE rn <= {_IVF_MULTI}),
    cell_sizes AS (SELECT centroid_id, COUNT(*) AS csz
                   FROM assign GROUP BY 1),
    post_tot AS (SELECT SUM(csz) AS t FROM cell_sizes),
    bud AS (SELECT t, CAST(floor((num * t + (den - 1)) / CAST(den AS DOUBLE))
                           AS BIGINT) AS b
            FROM (SELECT t, {num_case} AS num, {den_case} AS den
                  FROM (SELECT t, CAST(ceil(sqrt(
                             (SELECT COUNT(*) FROM embeddings
                              WHERE {base_pred})
                             / {IVF_SCALE_REF}.0)) AS BIGINT) AS s
                        FROM post_tot))),
    probes AS (SELECT query_id, centroid_id FROM (
                 SELECT r.vec_id AS query_id, r.centroid_id, s.csz,
                        SUM(s.csz) OVER (PARTITION BY r.vec_id
                                         ORDER BY r.rn) AS cum
                 FROM ranked r
                 JOIN cell_sizes s ON s.centroid_id = r.centroid_id
                 WHERE r.vec_id % 50 = 0 AND r.vec_id < 3200), bud
               WHERE cum - csz < b),
    cand AS (SELECT DISTINCT p.query_id, a.neighbor_id
             FROM probes p JOIN assign a USING (centroid_id)
             WHERE p.query_id <> a.neighbor_id),
    dots AS (SELECT cand.query_id, cand.neighbor_id,
                    {_DOT_AB.format(a='qe.embedding', b='ce.embedding')} AS dot
             FROM cand
             JOIN embeddings qe ON qe.vec_id = cand.query_id
             JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
    scored AS (SELECT query_id, neighbor_id,
                      dot / (qa.nrm * qb.nrm) AS cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY dot / (qa.nrm * qb.nrm) DESC,
                                                  neighbor_id ASC) AS rank
               FROM dots
               JOIN norms qa ON qa.vec_id = query_id
               JOIN norms qb ON qb.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= 10
    """


@query("ann_ivf_topk", oracle=_ivf_oracle(_kmeans_ctes(_IVF_ROUNDS, scaled=True)))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-10, TRAINED + redundantly assigned
    (the r7 verdict's top item): sampled init centroids (capped at 64,
    offset-robust relative to min(vec_id)) refined by 2 deterministic
    Lloyd rounds (decimal-mean updates — the whole training loop
    hash-matches DuckDB), every corpus vector indexed under its 3
    nearest cells (multi-assignment, the SPANN-style boundary fix),
    mass-budgeted probe over the standing 64-query panel (r10: probe
    cosine-ranked cells until 3/10 of the posting mass is covered —
    the oracle replays the identical integer rule).

    Recall@10 lineage: 0.45 trainless/single-assign (r7) -> 0.78-0.84
    trained at fixed nprobe=8, DRIFTING across scale (r8) ->
    0.955-0.972 FLAT across the 100× span at mass 3/10 (r10 numpy
    calibration, 5 points; the fixed-nprobe drift is structural —
    a cell count pins coverage only while cells stay equal-mass).
    The probed candidate mass is the explicit serve-cost dial
    (~0.66N unique candidates at 3/10 vs ~0.33N at nprobe=8); the
    trainer still dominates this end-to-end query's wall-clock.
    Costs are bounded constants: 2 extra assign passes (training), 3x
    index rows, budget·N probed rows — never superlinear in N."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return ivf_topk(
        emb, queries, k=10, centroid_mod=37, probe_mass=_IVF_MASS,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    )


@query("ann_ivf_recall", oracle=_recall_oracle("ann_ivf_topk"))
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the IVF tier against the exact tier, per query —
    the driver-checkable form of the RECALL_SCALE.json evidence (the
    artifact measures the mass-budgeted probe flat across 100×; this
    query pins its level at the driver SFs every round). Same
    bounded-panel evaluation as ann_lsh_recall: the comparison joins
    two <= 10-row-per-query sets, so the cost is the two searches."""
    from bigdatafinalproject_spark.operators.ann import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact_panel = emb.filter(F.col("vec_id") % 50 == 0)
    ivf_panel = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    ex = cosine_topk(
        emb, exact_panel, id_col="vec_id", vec_col="embedding", k=10
    ).select("query_id", "neighbor_id")
    ap = ivf_topk(
        emb, ivf_panel, k=10, centroid_mod=37, probe_mass=_IVF_MASS,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    ).select("query_id", "neighbor_id")
    return recall_frame(ex, ap)


def _ranking_oracle() -> str:
    h = oracle_hash64("u, concat_ws('-', i, ok, ln)", _SEED)
    return f"""
    WITH r AS (SELECT o_custkey AS u, l_partkey AS i, l_orderkey AS ok,
                      l_linenumber AS ln, l_extendedprice AS ep
               FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    spend AS (SELECT u, i, SUM(CAST(ep AS DECIMAL(25,6))) AS s FROM r GROUP BY u, i),
    recs AS (SELECT u, i FROM (
               SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY s DESC, i) AS rn
               FROM spend) WHERE rn <= 3),
    t AS (SELECT DISTINCT u, i FROM (
            SELECT u, i, row_number() OVER (PARTITION BY u
                         ORDER BY {h}, concat_ws('-', i, ok, ln)) AS rn
            FROM r) WHERE rn = 1),
    users AS (SELECT DISTINCT u FROM recs),
    hits AS (SELECT recs.u FROM recs
             WHERE EXISTS (SELECT 1 FROM t WHERE t.u = recs.u AND t.i = recs.i)),
    per_user AS (SELECT users.u, COALESCE(h.n_hit, 0) AS n_hit
                 FROM users LEFT JOIN (SELECT u, COUNT(*) AS n_hit FROM hits GROUP BY u) h
                 USING (u)),
    pos AS (SELECT COUNT(*) AS n_pos FROM t
            WHERE u IN (SELECT u FROM users))
    SELECT COUNT(*) AS n_users,
           CAST(SUM(n_hit) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS hit_rate,
           CAST(SUM(n_hit) AS DOUBLE) / (3 * COUNT(*)) AS precision_at_k,
           CAST(SUM(n_hit) AS DOUBLE) / (SELECT n_pos FROM pos) AS recall_at_k
    FROM per_user
    """


@query("eval_ranking_metrics", oracle=_ranking_oracle())
def eval_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hit_rate/precision/recall@3: deterministic top-spend recs scored
    against a portable-hash leave-one-out holdout."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    r = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("i"),
        F.concat_ws("-", "l_partkey", "l_orderkey", "l_linenumber").alias("_item"),
        "l_extendedprice",
    )
    split = leave_n_out(r, "u", "_item", n=1, seed=_SEED)
    test = split.filter(F.col("split") == "test").select("u", "i")
    spend = r.groupBy("u", "i").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).alias("s")
    )
    w = W.partitionBy("u").orderBy(F.col("s").desc(), F.col("i").asc())
    recs = (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("u", "i")
    )
    return ranking_metrics(recs, test, user_col="u", item_col="i", k=3)


@query("ann_ivf_index_search", oracle_of="ann_ivf_topk")
def ann_ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF serve path (operators/ann_index.py): the trained
    index (centroids + multi-assignment postings) is built ONCE per
    corpus fingerprint (source identity + hyperparameters) and
    persisted; this query serves the standing panel from the parquet
    index. Every build quantity is deterministic, so the served
    results are bit-identical to the end-to-end ``ann_ivf_topk`` —
    the two queries SHARE an oracle, which is the persistence theorem
    (build→persist→load→search ≡ train-and-search) checked by the
    driver every round. The production point: train/encode cost is
    paid per corpus version, not per query."""
    from bigdatafinalproject_spark.catalog import table_path
    from bigdatafinalproject_spark.operators.ann_index import (
        corpus_fingerprint,
        ensure_ivf_index,
        ivf_index_search,
        shared_index_dir,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    params = dict(
        centroid_mod=37, max_centroids=64,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    )
    fp = corpus_fingerprint(table_path(sf_dir, "embeddings"), **params)
    # cross-process cache keyed by fingerprint: the build runs once
    # per corpus version on this host; every later process serves warm
    idx = ensure_ivf_index(
        spark, emb, shared_index_dir("ivf", fp), fp,
        src=table_path(sf_dir, "embeddings"), **params,
    )
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return ivf_index_search(
        spark, idx, emb, queries, k=10, probe_mass=_IVF_MASS
    )


_IVF_BASE_PRED = "vec_id % 3 <> 0"


@query(
    "ann_ivf_index_append",
    # base_pred reaches BOTH the training CTEs and the r12 schedule
    # clamp (the serve resolves s from the manifest's base_rows; the
    # oracle replays it from the base count)
    oracle=_ivf_oracle(
        _kmeans_ctes(_IVF_ROUNDS, base_pred=_IVF_BASE_PRED, scaled=True),
        base_pred=_IVF_BASE_PRED,
    ),
)
def ann_ivf_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the TRAINED IVF index (the IVF twin
    of ``ann_pq_index_append``): centroids trained on the base corpus
    (vec_id % 3 != 0) and persisted; the delta batch is assigned to
    the FROZEN centroids with the same 3x multi-assignment and its
    postings appended — no retrain, no base re-assignment. Search runs
    over the maintained index. The oracle replays train-on-base +
    assign-all + search: hash match ≡ the maintenance theorem
    (assignment is row-local given frozen centroids); the documented
    drift trade (centroids reflect the base distribution) is the
    append-between-retrains pattern."""
    from bigdatafinalproject_spark.catalog import table_path
    from bigdatafinalproject_spark.operators.ann_index import (
        clone_index,
        corpus_fingerprint,
        ensure_ivf_index,
        ivf_index_append,
        ivf_index_search,
        shared_index_dir,
    )
    from bigdatafinalproject_spark.queries.layout import _scratch

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_IVF_BASE_PRED))
    delta = emb.filter(~F.expr(_IVF_BASE_PRED))
    params = dict(
        centroid_mod=37, max_centroids=64,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    )
    # snapshot-then-mutate (r9): the base-trained index is built ONCE
    # per corpus fingerprint (base_pred-salted, ADVICE r8) in the
    # shared cache and CLONED into a writer-private scratch dir for
    # the append -- a file copy instead of a retrain per run
    fp = corpus_fingerprint(
        table_path(sf_dir, "embeddings"), base_pred=_IVF_BASE_PRED, **params
    )
    cached = ensure_ivf_index(
        spark, base, shared_index_dir("ivf", fp), fp,
        src=table_path(sf_dir, "embeddings"), subset=_IVF_BASE_PRED,
        **params,
    )
    idx = clone_index(cached, _scratch(sf_dir, "ivfappendidx"))
    ivf_index_append(spark, idx, delta)
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return ivf_index_search(
        spark, idx, emb, queries, k=10, probe_mass=_IVF_MASS
    )


@query("ann_ivf_index_retract", oracle_of="ann_ivf_index_append")
def ann_ivf_index_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch RETRACTION on the trained persisted IVF index (r13): the
    delta arrives as two batches, the even batch is then UN-INGESTED
    via operators/ann_index.retract_batch — an O(manifest) metadata
    flip (units map, appended_rows, cell-size snapshot all reverse the
    batch's recorded provenance) plus a unit-dir GC, never a rewrite
    of postings — and re-appended under a new batch id. Every serve
    policy input (base_rows, appended_rows, folded cell sizes) is
    restored exactly, so the final index serves BIT-IDENTICALLY to the
    plain single-append twin and shares ann_ivf_index_append's oracle
    (the retraction theorem for a trained kind). RAISES unless the
    retraction's row/ledger accounting actually reversed."""
    from bigdatafinalproject_spark.catalog import table_path
    from bigdatafinalproject_spark.operators.ann_index import (
        _manifest,
        clone_index,
        corpus_fingerprint,
        ensure_ivf_index,
        ivf_index_append,
        ivf_index_search,
        retract_batch,
        shared_index_dir,
    )
    from bigdatafinalproject_spark.queries.layout import _scratch

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_IVF_BASE_PRED))
    delta = emb.filter(~F.expr(_IVF_BASE_PRED))
    params = dict(
        centroid_mod=37, max_centroids=64,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    )
    fp = corpus_fingerprint(
        table_path(sf_dir, "embeddings"), base_pred=_IVF_BASE_PRED, **params
    )
    cached = ensure_ivf_index(
        spark, base, shared_index_dir("ivf", fp), fp,
        src=table_path(sf_dir, "embeddings"), subset=_IVF_BASE_PRED,
        **params,
    )
    idx = clone_index(cached, _scratch(sf_dir, "ivfretractidx"))
    ivf_index_append(spark, idx, delta.filter(F.col("vec_id") % 2 == 0),
                     batch_id=0)
    ivf_index_append(spark, idx, delta.filter(F.col("vec_id") % 2 != 0),
                     batch_id=1)
    pre = _manifest(idx)
    retract_batch(idx, 0)
    mid = _manifest(idx)
    if not (
        int(mid["appended_rows"]) < int(pre["appended_rows"])
        and mid.get("retracted") == ["0"]
        and "0" not in mid.get("batches", {})
        and len(mid["units"]["postings"]) < len(pre["units"]["postings"])
    ):
        raise RuntimeError(
            f"retraction accounting did not reverse: {pre} -> {mid}"
        )
    # re-ingest the same vectors under a new batch id; the index is
    # now content-identical to the single-append twin
    ivf_index_append(spark, idx, delta.filter(F.col("vec_id") % 2 == 0),
                     batch_id=2)
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return ivf_index_search(
        spark, idx, emb, queries, k=10, probe_mass=_IVF_MASS
    )


@query("ann_ivf_index_minor_compact", oracle_of="ann_ivf_index_append")
def ann_ivf_index_minor_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-tiered MINOR compaction on the maintained IVF index
    (operators/ann_index.minor_compact_index — the r14 answer to the
    lazy-compaction file-count tax): the delta arrives as THREE
    batches; the minor pass merges the two aged-out batches' postings
    units into ONE L1 unit while the base tier stays untouched and the
    newest batch keeps its own unit AND its retractability. Bytes
    moved are bounded by the appended tier (never O(index), unlike
    compact_index), which is the only affordable compaction cadence at
    100 TB. The query RAISES unless the pass folded exactly the aged
    batches, merged their files, left ``appended_rows`` and the
    retained provenance intact, a folded batch refuses retraction, and
    the RETAINED batch still retracts exactly (retract + re-append
    under a new id). Content is rewrite-invariant throughout, so the
    serve shares ann_ivf_index_append's oracle (minor-compaction
    content-neutrality + post-minor retraction theorem)."""
    from bigdatafinalproject_spark.catalog import table_path
    from bigdatafinalproject_spark.operators.ann_index import (
        _manifest,
        clone_index,
        corpus_fingerprint,
        ensure_ivf_index,
        ivf_index_append,
        ivf_index_search,
        minor_compact_index,
        retract_batch,
        shared_index_dir,
    )
    from bigdatafinalproject_spark.queries.layout import _scratch

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_IVF_BASE_PRED))
    delta = emb.filter(~F.expr(_IVF_BASE_PRED))
    params = dict(
        centroid_mod=37, max_centroids=64,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        scale_ref=IVF_SCALE_REF,
    )
    fp = corpus_fingerprint(
        table_path(sf_dir, "embeddings"), base_pred=_IVF_BASE_PRED, **params
    )
    cached = ensure_ivf_index(
        spark, base, shared_index_dir("ivf", fp), fp,
        src=table_path(sf_dir, "embeddings"), subset=_IVF_BASE_PRED,
        **params,
    )
    idx = clone_index(cached, _scratch(sf_dir, "ivfminorcidx"))
    # delta is the vec_id%3==0 stripe — split it by vec_id%9 so all
    # three batches are non-empty
    for b in range(3):
        ivf_index_append(spark, idx,
                         delta.filter(F.col("vec_id") % 9 == 3 * b),
                         batch_id=b)
    pre = _manifest(idx)
    res = minor_compact_index(spark, idx, keep_recent=1)
    mid = _manifest(idx)
    merged_files, after_files = res["tables"].get("postings", (0, 0))
    if not (
        res["folded"] == [0, 1]
        and res["kept"] == [2]
        and after_files < merged_files
        and sorted(mid.get("batches", {})) == ["2"]
        # base + merged L1 + kept batch — one unit fewer than before
        and len(mid["units"]["postings"]) == len(pre["units"]["postings"]) - 1
        and int(mid["appended_rows"]) == int(pre["appended_rows"])
    ):
        raise RuntimeError(
            f"minor compaction did not tier as specified: {res}, "
            f"{pre['units']['postings']} -> {mid['units']['postings']}"
        )
    try:
        retract_batch(idx, 0)
        raise RuntimeError("retracting a FOLDED batch must raise")
    except ValueError:
        pass  # folded into the base tier — the documented refusal
    # the retained batch keeps exact retractability through the pass
    retract_batch(idx, 2)
    post = _manifest(idx)
    if int(post["appended_rows"]) >= int(mid["appended_rows"]):
        raise RuntimeError("post-minor retraction did not reverse rows")
    ivf_index_append(spark, idx,
                     delta.filter(F.col("vec_id") % 9 == 6), batch_id=3)
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    )
    return ivf_index_search(
        spark, idx, emb, queries, k=10, probe_mass=_IVF_MASS
    )


@query("stream_ivf_index_maintenance", oracle_of="ann_ivf_index_append")
def stream_ivf_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trained-IVF index maintenance
    (streaming/embeddings.stream_ivf_index_maintenance): centroids
    trained on the base corpus and frozen; delta embeddings consumed
    as a multi-batch stream, each micro-batch multi-assigned and its
    postings appended exactly once (manifest-recorded batch ids; a
    redelivered batch, simulated live after the drain, is an
    idempotent skip). The query RAISES unless the retrain trigger
    flips at a 0.4 appended-fraction budget and stays quiet at 0.6
    (the stream appends exactly 1/2 of base) — the protocol evidence
    runs in the driver-checked path (VERDICT r9 #5 extended this from
    PQ to the whole family). Shares the batch ann_ivf_index_append
    oracle: assignment is row-local given frozen centroids, so
    streaming ≡ one-shot maintenance. (Registered here, not in
    queries/streaming.py: oracle_of needs the twin registered first.)"""
    from bigdatafinalproject_spark.streaming.embeddings import (
        stream_ivf_index_maintenance as _impl,
    )

    return _impl(spark, sf_dir)
