"""Partition-layout helpers.

``spread``: compressed text/embedding parquet under-splits — a
byte-sized scan partition can hold a compute-heavy operator's worth of
rows (locally a whole table is often ONE split, so one task does every
shingle/dot-product). When the input has fewer partitions than the
cluster has cores, hash-spread it by key first; when the input is
already wide (the 100 TB case) this is a no-op, so operators can call
it unconditionally.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin(df: DataFrame, *key_cols: str | Column) -> DataFrame:
    """Explicitly hash-partition ``df`` by ``key_cols`` across
    ``defaultParallelism``.

    For a frame about to feed a window/groupBy keyed on the same
    columns this is SHUFFLE-NEUTRAL: the explicit exchange satisfies
    the operator's clustered-distribution requirement, so it replaces
    (not precedes) the exchange the operator would have inserted. The
    difference is that a user-specified partition count is exempt from
    AQE's byte-based coalescing — which otherwise shrinks byte-light
    but row- or compute-heavy inputs (compressed facts, pair keys) to
    a handful of tasks. Unlike ``spread`` this works on shuffle-fed
    frames, where the pre-AQE partition count is useless as a signal.
    """
    sc = df.sparkSession.sparkContext
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return df.repartition(sc.defaultParallelism, *cols)


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df``'s optimized plan — file
    bytes for scan-rooted frames, propagated estimates above. No job
    is run (this is the same statistic the broadcast planner reads).
    Returns None when the estimate is absent or the huge
    unknown-source default (checkpoint/RDD-rooted plans)."""
    try:
        n = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        )
    except Exception:
        return None
    # LogicalRDD / unknown sources report spark.sql.defaultSizeInBytes
    # (Long.MaxValue-ish) — treat anything absurd as unknown
    if n <= 0 or n > (1 << 50):
        return None
    return n


_BYTES_PER_TASK = 4 << 20


def scaled_parallelism(df: DataFrame, bytes_per_task: int = _BYTES_PER_TASK) -> int:
    """Data-derived partition count for a compute stage over ``df``:
    ceil(estimated bytes / ``bytes_per_task``) clamped to
    [1, defaultParallelism] — the optimization-guide rule that
    partitioning should follow input size, not a core-count constant.
    Falls back to defaultParallelism (today's behavior) when the plan
    carries no usable size estimate."""
    sc = df.sparkSession.sparkContext
    n = plan_size_bytes(df)
    if n is None:
        return sc.defaultParallelism
    return max(1, min(sc.defaultParallelism, -(-n // bytes_per_task)))


def spread_scaled(
    df: DataFrame, *key_cols: str | Column, parallelism: int | None = None
) -> DataFrame:
    """``spread`` for Arrow-kernel inputs (r14): repartition by key to
    a DATA-SIZED partition count instead of defaultParallelism, and
    without ``spread``'s ``rdd.getNumPartitions`` probe (which under
    AQE materializes shuffle-rooted subtrees as a throwaway job). At
    sf0.1 a 32-way respread of a 2,000-row frame costs more than the
    kernel pass it feeds; at sf30 the same call sizes up to the core
    count. Content-neutral: every consumer is partition-invariant by
    design. ``parallelism`` overrides the estimate (callers that know
    the corpus pass its scan-rooted figure down to checkpoint-rooted
    descendants whose own estimate is unusable)."""
    target = parallelism or scaled_parallelism(df)
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return df.repartition(target, *cols)


def spread(df: DataFrame, *key_cols: str | Column) -> DataFrame:
    """Repartition ``df`` across ``defaultParallelism`` by ``key_cols``
    iff it currently has fewer partitions than that (see module doc).
    The explicit partition count keeps AQE from byte-coalescing the
    exchange back to one task."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        return df.repartition(sc.defaultParallelism, *cols)
    return df


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns: bit i of x lands at position 2i, bit
    i of y at 2i+1. Values are masked to ``bits`` bits first, so the
    caller picks the resolution.

    Sorting by this value clusters rows so that any contiguous z-range
    covers a small rectangle in (x, y) space — the standard
    multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER)
    that lets min/max file statistics prune scans filtered on EITHER
    column, where a plain sort only serves its leading column.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftrightunsigned(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The same Morton interleave as ``zvalue`` in portable SQL
    (DuckDB-compatible bit operators), for oracle replay."""
    mask = (1 << bits) - 1
    parts = []
    # fully parenthesized: DuckDB's | binds tighter than <<
    for i in range(bits):
        parts.append(f"(((({x} & {mask}) >> {i}) & 1) << {2 * i})")
        parts.append(f"(((({y} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def scale_to_bits(col_expr: str, max_expr: str, bits: int) -> str:
    """Scale a non-negative integer expression into [0, 2^bits) by its
    maximum: ``(x * 2^bits) DIV (max + 1)``. Z-ordering REQUIRES both
    dimensions on the same bit width — interleaving an 11-bit key with
    a 7-bit key puts every varying high bit on the wide key, and the
    layout degenerates to a plain sort on it (no pruning on the narrow
    key). Portable: Spark ``DIV`` == DuckDB ``//`` for non-negatives."""
    return f"((CAST({col_expr} AS BIGINT) * {1 << bits}) DIV (CAST({max_expr} AS BIGINT) + 1))"


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order of (x_col, y_col): normalize both keys to ``bits`` bits
    (max-scaled — see ``scale_to_bits``), range-partition by the
    interleaved z-value, sort within each partition, drop the helper.
    Each output file then covers a narrow rectangle of the key space,
    so footer min/max stats prune 2-D range predicates on either
    column (demonstrated in tests/test_layout_zorder.py).

    The two max() lookups are one bounded scalar collect (metadata-
    grade action, same class as compact_small_files' file count)."""
    mx, my = df.agg(F.max(x_col), F.max(y_col)).first()
    z = zvalue(
        F.expr(scale_to_bits(x_col, str(mx), bits)),
        F.expr(scale_to_bits(y_col, str(my), bits)),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark,
    src_path: str | list[str],
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """OPTIMIZE-style small-files compaction: rewrite a fragmented
    parquet dataset into ~``target_bytes`` files. Returns the file
    count written. ``src_path`` may be a list of directories — the
    manifest-referenced unit dirs of a maintained index (v6): the
    rewrite must read exactly the LIVE units, never a directory
    listing that would sweep in a dead writer's unreferenced files.

    Why this is an operator and not "just a repartition": the output
    file COUNT must be computed from the INPUT's physical size, and at
    100 TB nothing may pass through the driver — the size comes from
    the file index Spark already built for the scan (kilobytes of
    metadata), never from the data. ``n = clamp(input_bytes /
    target_bytes)`` then:

    - unsorted: ``repartition(n)`` — round-robin, every output file
      lands within ~1 row group of target size regardless of input
      skew;
    - ``sort_col``: ``repartitionByRange(n, col)`` +
      ``sortWithinPartitions`` — compaction and global clustering in
      one shuffle, so each output file covers a disjoint key range
      (footer min/max prune like the z-order path, but 1-D).

    Compaction is content-neutral by contract — the registry query
    aggregates the compacted copy against the ORIGINAL table's oracle
    to prove it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    # physical size via the binaryFile source: a DISTRIBUTED file
    # listing that exposes (path, length) without reading content —
    # works on any Hadoop filesystem (local/HDFS/S3), moves only
    # metadata, and the content column is pruned by the projection
    def _listing_bytes_files(path: str) -> tuple[int, int]:
        row = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .load(path)
            .agg(F.sum("length").alias("b"), F.count(F.lit(1)).alias("f"))
            .first()
        )
        return (int(row.b) if row.b is not None else 0, int(row.f))

    srcs = [src_path] if isinstance(src_path, str) else list(src_path)
    # missing path and exists-but-empty both surface as the SAME
    # ValueError — callers see one error type for "nothing to compact"
    try:
        df = spark.read.parquet(*srcs)
        input_bytes, input_files = _listing_bytes_files(srcs)
    except AnalysisException as e:
        raise ValueError(
            f"compact: no *.parquet files under {src_path!r}"
        ) from e
    if input_files == 0:
        raise ValueError(f"compact: no *.parquet files under {src_path!r}")
    n = max(1, -(-input_bytes // target_bytes))
    if sort_col is None:
        out = df.repartition(n)
    else:
        out = df.repartitionByRange(n, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    out.write.mode("overwrite").parquet(dst_path)
    # count output files with the SAME distributed metadata listing as
    # the input sizing — filesystem-agnostic, unlike a local glob
    return _listing_bytes_files(dst_path)[1]
