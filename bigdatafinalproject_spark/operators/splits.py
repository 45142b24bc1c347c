"""Train/test split operators (SURVEY §7.4; reference ALS_model3.py:89-107,
222-225 and Model_evaluation.py:57-63).

The reference ordered rows inside each user partition by ``rand(seed)``
— which is only reproducible for one fixed input partitioning (SURVEY
§4.3-6). Here the per-user shuffle order is a PORTABLE md5-derived hash
of (seed, user, item): identical across runs, partition counts, and
engines (so the DuckDB oracle can replay every split exactly).

All splits are one window over ``partitionBy(user)`` — no shuffle
beyond the one keyed by user; skewed users are bounded by per-user
rating counts (power-law tail is short rows, AQE handles the heavy
head).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import portable_hash64
from bigdatafinalproject_spark.operators.layout import pin


def _user_order(user_col: str, item_col: str, seed: int) -> list[Column]:
    return [portable_hash64(user_col, item_col, seed=seed), F.col(item_col)]


def add_kfold(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    min_ratings: int = 7,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Per-user k-fold assignment (reference ALS_model3.py:89-107).

    Users with >= ``min_ratings`` rows get folds 0..k-1 assigned
    round-robin in hash-shuffled order (balanced per user, like the
    reference's ``row_number % k``); ineligible users get fold -1
    (always-train semantics).
    """
    ratings = pin(ratings, user_col)
    w = W.partitionBy(user_col).orderBy(*_user_order(user_col, item_col, seed))
    n_w = W.partitionBy(user_col)
    return ratings.withColumn("_n", F.count(F.lit(1)).over(n_w)).withColumn(
        fold_col,
        F.when(
            F.col("_n") >= min_ratings,
            (F.row_number().over(w) - 1) % k,
        )
        .otherwise(-1)
        .cast("int"),
    ).drop("_n")


def leave_n_out(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    n: int = 1,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Leave-N-out per user (reference ALS_model3.py:222-225 with n=1,
    Model_evaluation.py:57-63 with n=2): the first N rows per user in
    hash-shuffled order go to 'test', the rest to 'train'."""
    # the user-keyed window would otherwise inherit an AQE byte-coalesced
    # (often single-digit) partitioning on compressed fact scans
    ratings = pin(ratings, user_col)
    w = W.partitionBy(user_col).orderBy(*_user_order(user_col, item_col, seed))
    return ratings.withColumn(
        split_col,
        F.when(F.row_number().over(w) <= n, "test").otherwise("train"),
    )


def cold_start_filter(
    test: DataFrame,
    train: DataFrame,
    user_col: str,
    item_col: str,
) -> DataFrame:
    """Keep only test rows whose user AND item appear in train — native
    LEFT SEMI joins, replacing the reference's inner-join-on-distinct
    emulation (ALS_model3.py:140-142)."""
    train_users = train.select(user_col).distinct()
    train_items = train.select(item_col).distinct()
    return test.join(train_users, on=user_col, how="left_semi").join(
        train_items, on=item_col, how="left_semi"
    )
