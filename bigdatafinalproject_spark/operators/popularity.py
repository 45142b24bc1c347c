"""Popularity / top-k item ranking (SURVEY.md §7.2 — the flagship slice).

Re-expresses the reference's ``get_popular_books`` semantics
(reference: ALS_model3.py:182-191 — filter valid ratings → groupBy item
→ avg+count → HAVING count>=min → ORDER BY avg desc, count desc →
LIMIT n → join titles; also recommendations3.py:82-89's count-based
popularity pool) over a generic (fact, dim) pair.

Scale notes:
- The aggregation is a partial+final hash agg (map-side combine), the
  only shuffle keyed by the item id.
- ``orderBy().limit()`` compiles to ``TakeOrderedAndProject`` — per-
  partition top-n + driver merge, never a full sort.
- The dimension join happens AFTER the limit, so only ``top_n`` rows
  join — and the dim side is broadcast.
- A unique key is always the last sort tiebreaker so top-k is total-
  ordered (the reference's version was nondeterministic under avg ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import davg


def popular_items(
    ratings: DataFrame,
    item_col: str,
    rating_col: str,
    min_ratings: int = 20,
    top_n: int = 100,
    lo: float = 0.0,
    hi: float = 10.0,
) -> DataFrame:
    """Top-n items by (avg rating desc, count desc, item asc).

    Returns columns: ``<item_col>, avg_rating double, num_ratings long``.
    """
    r = F.col(rating_col)
    return (
        ratings.filter((r > lo) & (r <= hi))
        .na.drop(subset=[item_col, rating_col])
        .groupBy(item_col)
        .agg(
            davg(r).alias("avg_rating"),
            F.count(rating_col).alias("num_ratings"),
        )
        .filter(F.col("num_ratings") >= min_ratings)
        .orderBy(
            F.col("avg_rating").desc(),
            F.col("num_ratings").desc(),
            F.col(item_col).asc(),
        )
        .limit(top_n)
    )


def popular_items_with_names(
    ratings: DataFrame,
    dim: DataFrame,
    item_col: str,
    rating_col: str,
    name_col: str,
    min_ratings: int = 20,
    top_n: int = 100,
    lo: float = 0.0,
    hi: float = 10.0,
) -> DataFrame:
    """Flagship query: popularity top-n enriched with the dim name.

    The dim join is explicitly broadcast (reference used the same hint at
    recommendations3.py:73) and happens after the limit, so the join
    input is top_n rows regardless of fact-table size.
    """
    # dim MEMBERSHIP filters before the top-n (semi-join on the
    # broadcast dim), names attach after: an item missing from the dim
    # must promote the next candidate, not shrink the result (a plain
    # inner join after limit() would silently return < top_n rows on FK
    # gaps). The name join still touches only top_n rows.
    names = dim.select(item_col, name_col)
    in_dim = ratings.join(
        F.broadcast(names.select(item_col)), on=item_col, how="left_semi"
    )
    top = popular_items(in_dim, item_col, rating_col, min_ratings, top_n, lo, hi)
    return (
        top.join(F.broadcast(names), on=item_col, how="inner")
        .select(item_col, name_col, "avg_rating", "num_ratings")
        .orderBy(
            F.col("avg_rating").desc(),
            F.col("num_ratings").desc(),
            F.col(item_col).asc(),
        )
    )
