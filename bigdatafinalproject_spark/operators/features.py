"""Feature-engineering operators for training pipelines (net-new
surface — the reference's only featurization is ALS's implicit factor
learning; SURVEY §2.12).

Portable-determinism rules (NOTES.md): moment sums accumulate in
DECIMAL (order-independent and engine-exact for bounded-digit inputs);
closing arithmetic is a fixed sequence of IEEE double ops; hashes are
md5-derived (functions.portable_hash64), never engine hash()/rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import portable_hash64
from bigdatafinalproject_spark.operators.text import tokens

_D4 = "decimal(28,4)"


def standardize(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group z-score and min-max scaling of ``value_col``.

    One aggregation pass computes the per-group moments (decimal-exact
    sums -> sample std via the moment identity); the moments table is
    one row per group, broadcast back, so the fact side never shuffles.
    Adds ``z`` and ``minmax`` columns.
    """
    x = F.col(value_col).cast(_D4)
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(x * x).cast("double").alias("_sxx"),
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
    )
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    m = m.select(
        *group_cols,
        (sx / n).alias("_mean"),
        F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0)))).alias("_std"),
        "_mn",
        "_mx",
    )
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(m), on=group_cols)
        .withColumn("z", (v - F.col("_mean")) / F.col("_std"))
        .withColumn("minmax", (v - F.col("_mn")) / (F.col("_mx") - F.col("_mn")))
        .drop("_mean", "_std", "_mn", "_mx")
    )


def hashed_bow(
    df: DataFrame, text_col: str, id_col: str, dim: int = 64
) -> DataFrame:
    """Hashing-trick bag-of-words: token -> slot in [0, dim) via the
    portable hash, counted per (id, slot). The fixed-width sparse
    featurization that needs no vocabulary pass — one explode + one
    combine-enabled aggregation at any corpus size.

    Returns (id, slot:int, cnt:long).
    """
    t = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
    slot = F.pmod(portable_hash64("_tok"), F.lit(dim)).cast("int")
    return (
        t.select(id_col, slot.alias("slot"))
        .groupBy(id_col, "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    permille: tuple[int, int] = (800, 900),
    seed: int = 17,
) -> Column:
    """Leakage-safe train/val/test assignment: the split is a function
    of the GROUP key's hash (not the row's), so all rows of a group land
    in the same split — the standard guard against near-duplicate
    leakage across splits when documents from one source/site overlap.

    Returns a column: 'train' (< permille[0]), 'val' (< permille[1]),
    else 'test'. Pure expression — zero extra passes.
    """
    h = F.pmod(portable_hash64(group_col, seed=seed), F.lit(1000))
    return (
        F.when(h < permille[0], "train")
        .when(h < permille[1], "val")
        .otherwise("test")
    )
