"""Skew stress for item_cosine_pairs: max_per_user must bound the
pair explosion a heavy user causes (SURVEY §7.8-3 names skew as a
declared hard part).

The self-join on the user key generates C(n_u, 2) pairs per user, so
ONE user with 2 000 items contributes ~2M candidate pairs — the
classic power-law-skew failure. ``max_per_user`` caps every user's
item list (keeping the TOP-rated items, deterministically), turning
the per-user cost into C(cap, 2) regardless of how heavy the user is.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafinalproject_spark.operators.similarity import item_cosine_pairs

HEAVY_ITEMS = 800
CAP = 16
N_NORMAL = 60


def _skewed_ratings(spark):
    # user 0: HEAVY_ITEMS items, rating = item % 7 + (item mod pattern)
    heavy = spark.range(HEAVY_ITEMS).select(
        F.lit(0).alias("userId"),
        F.col("id").alias("itemId"),
        (F.col("id") % 7 + 1).cast("double").alias("rating"),
    )
    # normal users: 4 items each, overlapping windows so some pairs
    # co-occur across users
    normal = (
        spark.range(1, N_NORMAL + 1)
        .select(
            F.col("id").alias("userId"),
            F.explode(
                F.sequence(F.col("id") % 20, F.col("id") % 20 + 3)
            ).alias("itemId"),
        )
        .withColumn("rating", (F.col("itemId") % 5 + 1).cast("double"))
    )
    return heavy.unionByName(normal)


def test_cap_bounds_heavy_user_pair_explosion(spark):
    r = _skewed_ratings(spark)
    capped = item_cosine_pairs(
        r, "userId", "itemId", "rating", min_common=1, max_per_user=CAP
    )
    n_capped = capped.count()
    # the heavy user can contribute at most C(CAP, 2) pairs; normal
    # users at most C(4,2) each — the bound is structural, not a tuning
    # accident
    max_possible = CAP * (CAP - 1) // 2 + N_NORMAL * 6
    assert 0 < n_capped <= max_possible

    # uncapped, the same data explodes: the heavy user alone yields
    # C(HEAVY_ITEMS, 2) candidate pairs before min_common filtering
    uncapped = item_cosine_pairs(
        r, "userId", "itemId", "rating", min_common=1, max_per_user=None
    )
    n_uncapped = uncapped.count()
    assert n_uncapped >= HEAVY_ITEMS * (HEAVY_ITEMS - 1) // 2
    # the cap is what stands between linear and quadratic
    assert n_capped < n_uncapped / 100


def test_cap_keeps_top_rated_items_deterministically(spark):
    r = _skewed_ratings(spark)
    capped_twice = [
        sorted(
            map(
                tuple,
                item_cosine_pairs(
                    r, "userId", "itemId", "rating",
                    min_common=1, max_per_user=CAP,
                ).collect(),
            )
        )
        for _ in range(2)
    ]
    assert capped_twice[0] == capped_twice[1]
    # the heavy user's surviving items must be its top-rated ones:
    # rating 7 (ids ≡ 6 mod 7) ranks first, and with CAP=16 there are
    # more rating-7 candidates (~114) than the cap, so every kept item
    # of user 0 has rating 7. Pairs whose support can only come from
    # user 0 (any item id > 42, beyond the normal users' id range)
    # must therefore connect two rating-7 items.
    exclusive = [
        t
        for t in capped_twice[0]
        if t[0] > 42 or t[1] > 42
    ]
    assert exclusive, "expected heavy-user-exclusive pairs"
    assert all(
        t[0] % 7 == 6 and t[1] % 7 == 6 for t in exclusive
    ), "cap must keep the top-rated (rating-7) items"
