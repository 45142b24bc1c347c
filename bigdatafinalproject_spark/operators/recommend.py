"""Recommendation pipeline operators (SURVEY §7.5).

Covers the reference's MLlib surface (M1-M7: ALS fit/transform,
top-k recs, RMSE/AUC evaluators — reference ALS_model3.py:150-155,
230-244, recommendations3.py:60, Model_evaluation.py:75-92) plus a
Spark-native re-expression of its driver-side serving assembly
(recommendations3.py:100-173: per-user truncate, popularity backfill,
pad, pivot wide — there a pandas loop over users, here four DataFrame
ops that scale with the cluster).

Guarantees of ``assemble_topn`` (tested): exactly n items per user
(pool permitting), no per-user duplicates, original recs ranked first
in score order, backfill in pool order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def train_als(
    ratings: DataFrame,
    user_col: str = "userId",
    item_col: str = "itemId",
    rating_col: str = "rating",
    rank: int = 8,
    reg_param: float = 0.1,
    max_iter: int = 5,
    seed: int = 42,
):
    """MLlib ALS with the reference's parameterization style
    (nonnegative, coldStartStrategy='drop' — ALS_model3.py:230-239)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=rank,
        regParam=reg_param,
        maxIter=max_iter,
        seed=seed,
        nonnegative=True,
        coldStartStrategy="drop",
    )
    return als.fit(ratings)


def als_topk_flat(model, users: DataFrame, k: int) -> DataFrame:
    """recommendForUserSubset + explode + struct-field select (the
    reference's flatten at recommendations3.py:65-70). Returns
    (userId, itemId, score)."""
    recs = model.recommendForUserSubset(users, k)
    rec = F.explode("recommendations").alias("rec")
    return recs.select(recs.columns[0], rec).select(
        recs.columns[0],
        F.col("rec.*"),
    ).toDF(recs.columns[0], "itemId", "score")


def rmse(predictions: DataFrame, label_col: str = "rating", pred_col: str = "prediction") -> float:
    from pyspark.ml.evaluation import RegressionEvaluator

    return RegressionEvaluator(
        metricName="rmse", labelCol=label_col, predictionCol=pred_col
    ).evaluate(predictions)


def auc(predictions: DataFrame, label_col: str = "label", score_col: str = "score") -> float:
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    return BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol=score_col, metricName="areaUnderROC"
    ).evaluate(predictions)


def assemble_topn(
    recs: DataFrame,
    pool: DataFrame,
    user_col: str,
    item_col: str,
    score_col: str,
    n: int,
    keep: int | None = None,
) -> DataFrame:
    """Exactly-n per-user recommendation lists with popularity backfill,
    pivoted wide (rec_1..rec_n).

    recs: (user, item, score) — model or heuristic output; the top
          ``keep`` (default n) per user survive (the reference kept 10
          of 20 raw recs, recommendations3.py:14-17,119).
    pool: (item, pool_rank) — small, globally-ranked backfill list
          (broadcast; must hold >= n items for the exactly-n guarantee).

    Plan: rank recs per user (keep top n) -> anti-join the pool against
    each user's kept items -> rank backfill by pool order -> union with
    source precedence (recs before backfill) -> final per-user rank ->
    pivot with an explicit value list. Two window passes + one
    broadcast anti-join; no driver-side loop (the reference iterated
    users in Python, recommendations3.py:120-151).
    """
    keep = n if keep is None else keep
    w_score = W.partitionBy(user_col).orderBy(F.col(score_col).desc(), F.col(item_col).asc())
    kept = (
        recs.withColumn("_rn", F.row_number().over(w_score))
        .filter(F.col("_rn") <= keep)
        .select(user_col, item_col, F.lit(0).alias("_src"), F.col("_rn").alias("_ord"))
    )
    users = kept.select(user_col).distinct()
    backfill = (
        users.join(F.broadcast(pool.select(item_col, "pool_rank")), how="cross")
        .join(kept.select(user_col, item_col), on=[user_col, item_col], how="left_anti")
        .select(user_col, item_col, F.lit(1).alias("_src"), F.col("pool_rank").alias("_ord"))
    )
    w_final = W.partitionBy(user_col).orderBy("_src", "_ord")
    final = (
        kept.unionByName(backfill)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= n)
    )
    return (
        final.groupBy(user_col)
        .pivot("rank", list(range(1, n + 1)))
        .agg(F.first(item_col))
        .toDF(user_col, *[f"rec_{i}" for i in range(1, n + 1)])
    )
