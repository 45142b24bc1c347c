"""Skew mitigation (SURVEY §7.8-3: power-law users/items hit keyed
shuffles; AQE's skew-join handles sort-merge joins automatically, but
aggregations and non-AQE-eligible joins need explicit salting).

Two standard tools:

- ``salted_agg``: two-phase aggregation — partial agg on (key, salt),
  final agg on key. Turns one hot key's single reducer into
  ``num_salts`` parallel reducers. Only for associative aggregates.
- ``salted_join``: replicate the small side ``num_salts`` times,
  scatter the big side's hot keys across salts, join on (key, salt).

Both are deterministic: the salt is a portable hash of a row
discriminator, never ``rand()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import portable_hash64


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    salt_from: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs run per (key, salt); ``final_aggs(partial_df)`` builds
    the merge aggregates over the partial results (e.g. partial
    count->sum, partial sum->sum, partial min->min).
    """
    salt = F.pmod(portable_hash64(salt_from, seed=7), F.lit(num_salts)).alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs(partial))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side scatters each key over
    ``num_salts`` salts (derived from ``salt_from``, a high-cardinality
    big-side column); the small side is replicated once per salt.

    Cost: small side × num_salts (fine — it is small); benefit: the hot
    key's rows spread over num_salts reducers instead of one.

    ``how`` is restricted to big-side-preserving joins: for right/full
    outer joins the replicated small side would emit one null-extended
    row PER SALT for unmatched small-side keys (num_salts duplicates).
    Use a plain join (plus AQE skew handling) for those.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — "
            "right/full joins would duplicate unmatched small-side rows "
            "once per salt"
        )
    discr = salt_from or on
    b = big.withColumn(
        "_salt", F.pmod(portable_hash64(discr, seed=7), F.lit(num_salts)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")
