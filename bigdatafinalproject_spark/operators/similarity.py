"""Item-item cosine similarity over co-occurrence data (SURVEY §7.6).

Replaces the reference's pivot-to-dense-matrix + sklearn path
(reference: similarity_matrix.py:36-48, which pivots users into 77 K
columns with ``pivotMaxValues=5_000_000`` and densifies O(U×I) on the
driver) with the sparse self-join formulation:

    cosine(a, b) = sum_{u rated both} r_ua * r_ub / (||r_a|| * ||r_b||)

- the self-join on the user key only generates pairs that actually
  co-occur (sparse dot product);
- norms are one pass over the ratings;
- sums accumulate in decimal (order-independent => oracle-exact);
- a ``min_common`` support threshold bounds the pair explosion from
  heavy users (at 100 TB you'd additionally cap per-user item lists —
  standard practice, exposed as ``max_per_user``).

For billion-item catalogs the LSH candidate generation in
operators/ann.py / operators/dedup.py replaces the exact self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_DEC = "decimal(25,6)"


def item_cosine_pairs(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    min_common: int = 2,
    max_per_user: int | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Cosine similarity for item pairs sharing >= min_common users.

    Returns (item_a, item_b, n_common, cosine) with item_a < item_b,
    optionally the global top_n by (cosine desc, item_a, item_b).
    """
    r = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).cast("double").alias("r"),
    )
    if max_per_user is not None:
        w = W.partitionBy("u").orderBy(F.col("r").desc(), F.col("i").asc())
        r = r.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= max_per_user
        ).drop("_rn")

    norms = r.groupBy("i").agg(
        F.sqrt(F.sum((F.col("r") * F.col("r")).cast(_DEC)).cast("double")).alias("norm")
    )

    a = r.select(F.col("u"), F.col("i").alias("item_a"), F.col("r").alias("ra"))
    b = r.select(F.col("u"), F.col("i").alias("item_b"), F.col("r").alias("rb"))
    pairs = (
        a.join(b, on="u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum((F.col("ra") * F.col("rb")).cast(_DEC)).alias("_dot"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    na = norms.select(F.col("i").alias("item_a"), F.col("norm").alias("_na"))
    nb = norms.select(F.col("i").alias("item_b"), F.col("norm").alias("_nb"))
    out = (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_common",
            (F.col("_dot").cast("double") / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("cosine").desc(), F.col("item_a").asc(), F.col("item_b").asc()
        ).limit(top_n)
    return out
