"""Engine-portable scalar helpers.

Two concerns drive this module:

1. **Cross-engine determinism.** The DuckDB oracle hash-compares values,
   so every nondeterministic-across-engines construct (float summation
   order, engine-specific hash functions, ``rand()``) is replaced by a
   portable equivalent: decimal-typed sums, md5-derived hashes, and
   hash-derived pseudo-randomness. This also fixes the reference's
   seeded-``rand()`` reproducibility hazard (SURVEY.md §4.3-6:
   ``orderBy(rand(seed))`` at reference ALS_model3.py:103,222 is stable
   only for a fixed partitioning).

2. **Scale.** All helpers are pure column expressions — JVM-side,
   whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sums of money-like doubles are accumulated as decimals so the result is
# exact and engine-independent (IEEE double addition is order-dependent;
# decimal addition is not). Matching oracle-SQL pattern:
#   CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)
_DEC = "decimal(25,6)"


def dsum(expr: Column) -> Column:
    """Order-independent sum of a double expression, returned as double."""
    return F.sum(expr.cast(_DEC)).cast("double")


def davg(expr: Column) -> Column:
    """Order-independent average of a double expression, as double.

    The decimal sum is cast to double BEFORE the divide so both engines
    perform the same IEEE double division (decimal-division scale rules
    differ between engines).
    """
    return F.sum(expr.cast(_DEC)).cast("double") / F.count(expr)


def portable_hash64(*cols: Column | str, seed: int = 0) -> Column:
    """Deterministic 63-bit hash identical in Spark and DuckDB.

    Built from md5 (available and identical in both engines): take the
    first 15 hex digits (60 bits, always fits a signed 64-bit int).
    DuckDB oracle equivalent:
        ('0x' || substr(md5(concat_ws('|', seed, cols...)), 1, 15))::BIGINT
    Spark implementation below uses conv(hex, 16, 10).

    Used wherever the reference used ``rand(seed)`` for splits
    (reference: ALS_model3.py:103,222, Model_evaluation.py:59) — unlike
    rand-over-a-window, a key hash is reproducible across runs, engines,
    and partition counts.
    """
    parts = [F.lit(str(seed))] + [F.col(c) if isinstance(c, str) else c for c in cols]
    hexstr = F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15)
    return F.conv(hexstr, 16, 10).cast("long")


def portable_hash_hex(*cols: Column | str, seed: int = 0) -> Column:
    """Full md5 hex digest of '|'-joined columns (for exact-dup keys)."""
    parts = [F.lit(str(seed))] + [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def bucket(*cols: Column | str, k: int, seed: int = 0) -> Column:
    """Deterministic bucket/fold id in [0, k) from a portable hash."""
    return F.pmod(portable_hash64(*cols, seed=seed), F.lit(k)).cast("int")


ORACLE_DEC = _DEC


def oracle_hash64(sql_expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL text mirroring :func:`portable_hash64` (string seeds
    mirror the operator layer's per-purpose seed labels, e.g. 'win')."""
    return f"(('0x' || substr(md5(concat_ws('|', '{seed}', {sql_expr})), 1, 15))::BIGINT)"


def oracle_bucket(sql_expr: str, k: int, seed: int = 0) -> str:
    """DuckDB SQL text mirroring :func:`bucket` (hash is non-negative)."""
    return f"CAST({oracle_hash64(sql_expr, seed)} % {k} AS INT)"
