"""Write-Audit-Publish: stage a table write, audit the STAGED copy,
publish atomically only if every audit passes.

The pattern behind Iceberg's WAP / dbt's build-then-swap: consumers
never observe a half-written or invalid table, because the publish
step is a filesystem rename (atomic on a POSIX dir / object-store
pointer swap) that only happens after the audits ran against the
exact bytes being published — not against the input DataFrame, whose
re-computation could differ.

At 100 TB the staged write is the same distributed write the direct
path would do (no extra data pass); audits are aggregate scans of the
staged copy (count-shaped, cheap relative to the write); publish is
metadata-only. A failed audit leaves the staged directory in place
for debugging and raises with the per-audit violation counts.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    dest: str,
    audits: dict[str, Callable[[DataFrame], int]],
    staging_suffix: str = "_staging",
) -> str:
    """Write ``df`` to ``dest`` via stage → audit → atomic publish.

    ``audits`` maps audit name → function(staged DataFrame) returning
    the VIOLATION COUNT (0 = pass). All audits run against the staged
    parquet readback. On any violation: raises ``ValueError`` naming
    every failing audit and its count; the staged directory is KEPT
    for inspection and ``dest`` is untouched (old version, if any,
    still serves). On success: the previous version is swapped out
    and the staged directory renamed into place.

    Atomicity honesty: a FIRST publish is one rename (atomic). A
    RE-publish over an existing version is two renames (dest→_prev,
    staged→dest) — plain POSIX directories have no atomic exchange,
    so there is a microscopic window where ``dest`` is absent; table
    formats close it with a metadata pointer swap, which is the
    production answer. What this implementation does guarantee: the
    window never loses data — on entry it SELF-HEALS a crash inside
    the window (dest missing but ``_prev`` present → ``_prev`` is
    restored before anything else), so the previous version always
    survives a mid-swap failure.

    Concurrency (r8): publishers serialize through an exclusive-create
    commit log (``dest_log/v<N>.json``, operators/txlog.py — the
    Delta-style put-if-absent CAS). Each writer stages to a
    writer-unique directory, audits, then claims version
    ``latest + 1``; exactly one claim can succeed, the loser raises
    :class:`~bigdatafinalproject_spark.operators.txlog.ConcurrentWriteError`
    with its staged copy kept and the serving copy untouched — two
    concurrent publishers can no longer interleave their rename pairs.

    Returns ``dest``.
    """
    from bigdatafinalproject_spark.operators.txlog import (
        commit_exclusive,
        latest_version,
    )

    dest = dest.rstrip("/")
    old = dest + "_prev"
    # crash recovery: a previous publish died between the two renames
    if not os.path.exists(dest) and os.path.exists(old):
        os.rename(old, dest)
    # OCC read snapshot (Delta-style): the target version is fixed at
    # TRANSACTION START — any writer that commits while we stage/audit
    # makes our own commit a conflict, so the CAS below fails exactly
    # when someone else published concurrently
    log = dest + "_log"
    version = (latest_version(log) or 0) + 1
    # writer-unique staging: two concurrent publishers must not
    # overwrite each other's staged bytes (pid + thread id covers both
    # cross-process and threaded writers; a repeat attempt by the same
    # writer reuses — and first clears — its own dir)
    import threading as _threading

    staged = (
        f"{dest}{staging_suffix}_{os.getpid()}_{_threading.get_ident()}"
    )
    shutil.rmtree(staged, ignore_errors=True)
    df.write.mode("overwrite").parquet(staged)
    staged_df = spark.read.parquet(staged)
    failures = {
        name: n for name, fn in audits.items() if (n := int(fn(staged_df))) > 0
    }
    if failures:
        raise ValueError(
            f"write_audit_publish: audits failed for {dest!r}: {failures}; "
            f"staged copy kept at {staged!r}"
        )
    # CAS: claim the version fixed at txn start, before touching the
    # serving copy; the loser aborts here with dest untouched and its
    # staged copy kept
    commit_exclusive(
        log, version, {"writer_pid": os.getpid(), "staged": staged}
    )
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dest):
        os.rename(dest, old)
    os.rename(staged, dest)
    shutil.rmtree(old, ignore_errors=True)
    return dest


def read_published(spark: SparkSession, dest: str) -> DataFrame:
    """Read a WAP-published table, healing the mid-swap crash window on
    the READ side (ADVICE r7): if ``dest`` is momentarily absent but
    ``dest_prev`` holds the full previous version (a publisher crashed
    between the two renames), restore it and serve — so the documented
    "the window never loses data" guarantee extends to readers, not
    just to the next writer. A concurrent reader that loses the rename
    race (both paths absent at its probe instant) retries once off the
    healed state before giving up."""
    dest = dest.rstrip("/")
    old = dest + "_prev"
    for _ in range(2):
        if os.path.exists(dest):
            return spark.read.parquet(dest)
        if os.path.exists(old):
            try:
                os.rename(old, dest)
            except OSError:
                pass  # another reader/writer healed first — re-probe
    raise FileNotFoundError(
        f"read_published: neither {dest!r} nor its _prev exists "
        f"(table never published, or both halves removed)"
    )
