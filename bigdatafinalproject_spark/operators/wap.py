"""Write-Audit-Publish: stage a table write, audit the STAGED copy,
publish atomically only if every audit passes.

The pattern behind Iceberg's WAP / dbt's build-then-swap: consumers
never observe a half-written or invalid table, because publish is an
ATOMIC METADATA POINTER SWAP — the destination path is a symlink to an
immutable version directory, and ``os.replace`` of a symlink is one
atomic rename. There is NO window where the destination is absent
(the r7 design's two-rename window, and the reader/writer heal races
it forced, are gone — r8 adversarial-review findings #1/#2).

Writers serialize through an exclusive-create commit log
(operators/txlog.py, the Delta-style put-if-absent CAS): the target
version is fixed at transaction start (OCC read snapshot), staged
bytes are written to a writer-unique directory, audits run against
the staged readback, and only the CAS winner renames its staging into
the immutable ``<dest>_v<N>`` slot and swaps the pointer. A loser
aborts with ``ConcurrentWriteError`` — serving copy untouched, staged
copy kept for inspection until the next successful publish sweeps
abandoned staging siblings.

At 100 TB the staged write is the same distributed write the direct
path would do (no extra data pass); audits are aggregate scans of the
staged copy; publish is metadata-only. On an object store the symlink
swap maps to the same atomic pointer update table formats use.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdatafinalproject_spark.operators.txlog import (
    claim_payload,
    commit_exclusive,
    latest_version,
)

_KEEP_VERSIONS = 2  # current + previous (readers mid-scan keep handles)
_STAGING_GRACE_S = 3600.0  # abandoned-staging sweep grace window


def _vdir(dest: str, version: int) -> str:
    return f"{dest}_v{version}"


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
    still serves). On success: the staged directory becomes the
    immutable version ``<dest>_v<N>`` and ``dest`` (a symlink) is
    atomically repointed — readers see the old version until the
    instant of the swap, then the new one; never neither.

    Concurrency: publishers are OCC transactions against the commit
    log (``dest_log``). The version is read at transaction start and
    claimed (exclusive create) after audits pass; a concurrent commit
    in between makes the claim fail with ``ConcurrentWriteError`` and
    this publisher aborts without touching the serving copy. Version
    directories are immutable and writer-unique by construction, so
    two winners of DIFFERENT versions can never interleave into the
    same directory; the pointer always lands on a complete version.

    Crash honesty: a crash after the CAS but before the pointer swap
    leaves a committed log entry whose content never served — the next
    publisher simply supersedes it (the log serializes writers; the
    pointer, not the log, names the served version). A crash before
    the CAS leaves only an abandoned staging directory, swept by the
    next successful publish.

    Returns ``dest``.
    """
    dest = dest.rstrip("/")
    log = dest + "_log"
    # OCC read snapshot: target version fixed at transaction start
    version = (latest_version(log) or 0) + 1
    # legacy layout migration: a real directory at dest (pre-pointer
    # layout) becomes version 0's content so the swap below can be a
    # pure symlink replace
    if os.path.isdir(dest) and not os.path.islink(dest):
        legacy = _vdir(dest, 0)
        if not os.path.exists(legacy):
            os.rename(dest, legacy)
            os.symlink(os.path.basename(legacy), dest)
    # writer-unique staging: pid + thread id covers cross-process and
    # threaded publishers; a retry by the same writer reuses its dir
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
    # CAS: claim the version fixed at txn start; the loser aborts here
    # with dest untouched and its staged copy kept
    # self-describing claim payload (r11, shared shape from txlog),
    # pid mode: a version commit is a PERMANENT record, not a renewed
    # claim — recording an unrenewed lease here would falsely read as
    # a crashed writer 30 s later (r11 review #3); writer_pid kept
    # for compatibility with pre-r11 log readers
    commit_exclusive(
        log, version,
        claim_payload(
            {"writer_pid": os.getpid(), "staged": staged}, mode="pid"
        ),
    )
    vdir = _vdir(dest, version)
    os.rename(staged, vdir)  # immutable version slot, unique per CAS win
    # atomic pointer swap: build the new symlink aside, replace in one
    # rename — no instant where dest is missing or half-written
    tmp_ptr = f"{dest}_ptr_{os.getpid()}_{_threading.get_ident()}"
    try:
        os.remove(tmp_ptr)
    except FileNotFoundError:
        pass
    os.symlink(os.path.basename(vdir), tmp_ptr)
    os.replace(tmp_ptr, dest)
    _sweep(dest, version, staging_suffix)
    return dest


def _sweep(dest: str, version: int, staging_suffix: str) -> None:
    """Post-publish garbage collection (r8 review finding #7): drop
    version directories older than the retained window and abandoned
    staging siblings from crashed/raced writers. Best-effort — a
    failure here never fails the publish.

    Retention keeps the ``_KEEP_VERSIONS`` highest EXISTING version
    directories AT OR BELOW the version just published, not a
    version-number threshold (ADVICE r8): version numbers are NOT
    dense — a CAS-claimed-but-crashed publish leaves a numbering gap
    with no directory, after which ``v <= version - N`` arithmetic
    would sweep the directory that was serving until a moment ago,
    shrinking the promised current+previous window under a mid-scan
    reader. Directories ABOVE ``version`` are excluded from the count
    (r9 review #2): they belong to a CONCURRENT publisher between its
    version rename and its pointer swap — counting one would push this
    publisher's previous version out of the retained window while
    readers may still hold it."""
    vdirs: list[tuple[int, str]] = []
    for p in _glob.glob(f"{dest}_v[0-9]*"):
        try:
            v = int(p.rsplit("_v", 1)[1])
        except ValueError:
            continue
        if v <= version:
            vdirs.append((v, p))
    for _, p in sorted(vdirs)[:-_KEEP_VERSIONS]:
        shutil.rmtree(p, ignore_errors=True)
    import time as _time

    for p in _glob.glob(f"{dest}{staging_suffix}_*"):
        # age guard: never delete a CONCURRENT writer's in-flight
        # staging — only dirs idle past the grace window are abandoned
        try:
            idle = _time.time() - os.path.getmtime(p)
        except OSError:
            continue
        if idle > _STAGING_GRACE_S:
            shutil.rmtree(p, ignore_errors=True)


def read_published(spark: SparkSession, dest: str) -> DataFrame:
    """Read a WAP-published table. With the pointer layout there is no
    crash window to heal (the r7 ``_prev`` fallback is obsolete): the
    symlink always names a complete immutable version. Still accepts a
    legacy real-directory layout unchanged. Raises FileNotFoundError
    if the table was never published."""
    dest = dest.rstrip("/")
    if os.path.exists(dest):
        return spark.read.parquet(dest)
    raise FileNotFoundError(
        f"read_published: {dest!r} does not exist (never published)"
    )
