"""Weighted exactly-k sampling in exact integer arithmetic.

A training-corpus sampler usually wants "pick k documents with
probability proportional to size (tokens)" — and wants the SAME k
documents on every run, engine, and partition count. Floating-point
weighted reservoirs (Efraimidis–Spirakis u^(1/w) keys) are the textbook
answer but their transcendental key math is not bit-portable across
engines. Systematic (Madow) sampling is: order the items pseudo-randomly
(portable md5 hash), take the cumulative weight line, and select every
item whose weight interval crosses one of the k equally-spaced marks —
pure integer comparisons, so DuckDB replays it exactly.

Scale design: the only global structure is the prefix sum, computed with
``operators/cumsum.running_sum`` (range partition → parallel partition
sums → #partitions-row offset window) — no single-task window at any
data size. Selection is then a row-local integer predicate against the
broadcast total weight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatafinalproject_spark.functions import portable_hash64
from bigdatafinalproject_spark.operators.cumsum import running_sum


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    hash_cols: list[str | Column],
    seed: int = 0,
    checkpoint_dir: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Select exactly ``k`` rows with probability proportional to
    ``weight_col`` (positive integers), deterministically.

    Row i (in portable-hash order, ties broken by ``hash_cols``) is
    selected iff floor(k*cum_i / W) > floor(k*cum_{i-1} / W) — its
    half-open weight interval (cum_{i-1}, cum_i] contains a multiple
    of W/k. Exactly k selections when every weight <= W/k (one row can
    absorb multiple marks otherwise — its ``pick`` then jumps by >1 and
    fewer than k rows come back). ``strict=True`` runs a one-pass
    aggregate up front and raises ValueError when max(weight) > W/k,
    so an under-k result is never silent; the default stays lazy.
    Adds ``pick`` (1..k) and drops helpers.

    Integer overflow note: k*W must fit int64 here; at 100 TB token
    weights, route the multiply through decimal(38,0) — the comparison
    stays exact either way.
    """
    if strict:
        chk = df.agg(
            F.max(weight_col).cast("long").alias("_mx"),
            F.sum(weight_col).cast("long").alias("_w"),
        ).first()
        if chk._mx is not None and chk._mx * k > chk._w:
            raise ValueError(
                f"weighted_systematic_sample: max weight {chk._mx} exceeds "
                f"W/k = {chk._w}/{k}; a single row spans multiple marks, so "
                f"fewer than k={k} rows would be returned"
            )
    keyed = df.withColumn("_hk", portable_hash64(*hash_cols, seed=seed))
    order = [F.col("_hk")] + [
        F.col(c) if isinstance(c, str) else c for c in hash_cols
    ]
    cum = running_sum(
        keyed,
        weight_col,
        order,
        out_col="_cum",
        checkpoint_dir=checkpoint_dir,
    ).withColumn("_cum", F.col("_cum").cast("long"))
    total = df.agg(F.sum(weight_col).cast("long").alias("_W"))
    marks_hi = F.expr(f"({k} * _cum) DIV _W")
    marks_lo = F.expr(f"({k} * (_cum - {weight_col})) DIV _W")
    return (
        cum.crossJoin(F.broadcast(total))
        .where(marks_hi > marks_lo)
        .withColumn("pick", marks_hi.cast("int"))
        .drop("_hk", "_cum", "_W")
    )
