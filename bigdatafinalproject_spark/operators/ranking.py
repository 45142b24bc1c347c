"""Ranking-quality metrics for recommender evaluation (extends the
reference's metric surface — it computed only RMSE/AUC; its
rec_eval_results CSV carried top-5 hit labels with no generating
script, SURVEY §5.1).

All metrics are exact integer ratios (one double division at the end),
so they oracle-check bit-for-bit given deterministic recs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_metrics(
    recs: DataFrame,
    test: DataFrame,
    user_col: str,
    item_col: str,
    k: int,
) -> DataFrame:
    """hit_rate@k, precision@k, recall@k over a recommendation set.

    recs: (user, item, rank) with rank <= k (one row per recommended
          item); test: (user, item) held-out positives. Users present
          in recs define the evaluation population.

    Returns one row: n_users, n_hits, hit_rate (users with >=1 hit),
    precision_at_k (hits / (k * users)), recall_at_k (hits / test
    positives of evaluated users).
    """
    r = recs.select(F.col(user_col).alias("u"), F.col(item_col).alias("i")).filter(
        F.col("i").isNotNull()
    )
    t = test.select(F.col(user_col).alias("u"), F.col(item_col).alias("i")).distinct()
    users = r.select("u").distinct()

    hits = r.join(t, on=["u", "i"], how="left_semi")
    per_user = (
        users.join(hits.groupBy("u").agg(F.count(F.lit(1)).alias("n_hit")), "u", "left")
        .na.fill({"n_hit": 0})
    )
    test_pos = (
        t.join(users, on="u", how="left_semi").groupBy().agg(F.count(F.lit(1)).alias("n_pos"))
    )
    agg = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_hit").alias("n_hits"),
        F.sum(F.when(F.col("n_hit") > 0, 1).otherwise(0)).alias("n_users_hit"),
    )
    return (
        agg.crossJoin(test_pos)
        .select(
            "n_users",
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_users_hit").cast("double") / F.col("n_users")).alias("hit_rate"),
            (F.col("n_hits").cast("double") / (F.lit(k) * F.col("n_users"))).alias(
                "precision_at_k"
            ),
            (F.col("n_hits").cast("double") / F.col("n_pos")).alias("recall_at_k"),
        )
    )
