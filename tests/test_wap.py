"""Write-Audit-Publish semantics under the r8 pointer layout: a failed
audit must never publish, publish is an atomic symlink swap over
immutable version directories (no absent-destination window), writers
serialize through the exclusive-create commit log, and crashes at any
protocol step leave the previous version serving."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.txlog import (
    ConcurrentWriteError,
    commit_exclusive,
    latest_version,
)
from bigdatafinalproject_spark.operators.wap import (
    read_published,
    write_audit_publish,
)
from tests.conftest import SF_DIR


def _audits():
    return {
        "nonpositive_price": lambda df: df.filter(
            F.col("o_totalprice") <= 0
        ).count()
    }


def test_failed_audit_keeps_old_version_and_staged_copy(spark, tmp_path):
    dest = str(tmp_path / "wap_orders")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # first publish succeeds
    write_audit_publish(spark, o, dest, _audits())
    v1 = spark.read.parquet(dest).count()
    assert v1 == o.count()
    assert os.path.islink(dest), "publish must leave a pointer"

    # second write injects violations -> audit must block the swap
    bad = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, -1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    with pytest.raises(ValueError, match="nonpositive_price"):
        write_audit_publish(spark, bad, dest, _audits())
    # old version still serves, bit-for-bit row count intact
    assert spark.read.parquet(dest).count() == v1
    assert spark.read.parquet(dest).filter(
        F.col("o_totalprice") <= 0
    ).count() == 0
    # staged copy kept for debugging (writer-unique staging dir)
    import glob

    hits = glob.glob(f"{dest}_staging_*")
    assert len(hits) == 1 and os.path.isdir(hits[0])
    staged = hits[0]
    assert spark.read.parquet(staged).filter(
        F.col("o_totalprice") <= 0
    ).count() > 0

    # a corrected retry publishes over the old version (and consumes
    # its own staging dir)
    write_audit_publish(spark, o, dest, _audits())
    assert spark.read.parquet(dest).count() == v1
    assert not os.path.isdir(staged)


def test_crash_after_cas_before_swap_keeps_old_version_serving(
    spark, tmp_path
):
    """A publisher that dies AFTER claiming its version (log entry +
    version directory in place) but BEFORE the pointer swap leaves the
    previous version serving — and the next publisher supersedes the
    phantom version without disturbance (the pointer, not the log,
    names the served version)."""
    dest = str(tmp_path / "wap_crash")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_audit_publish(spark, o, dest, _audits())
    n = spark.read.parquet(dest).count()

    # simulate the crashed publisher: v2 claimed + content landed, no swap
    commit_exclusive(dest + "_log", 2, {"writer_pid": -1})
    o.limit(5).write.mode("overwrite").parquet(f"{dest}_v2")
    # readers: still the v1 content, no window, no heal needed
    assert read_published(spark, dest).count() == n

    # the next publish supersedes the phantom v2 with v3
    write_audit_publish(spark, o.limit(10), dest, _audits())
    assert latest_version(dest + "_log") == 3
    assert read_published(spark, dest).count() == 10


def test_read_published_serves_pointer_and_errors_when_absent(
    spark, tmp_path
):
    dest = str(tmp_path / "wap_read")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_audit_publish(spark, o, dest, _audits())
    assert read_published(spark, dest).count() == o.count()
    with pytest.raises(FileNotFoundError):
        read_published(spark, str(tmp_path / "never_published"))


def test_legacy_real_directory_dest_migrates_to_pointer(spark, tmp_path):
    """A pre-pointer layout (real directory at dest) is adopted as
    version 0 and the publish completes with a pointer swap — old
    readers' path keeps working."""
    dest = str(tmp_path / "wap_legacy")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    o.limit(7).write.mode("overwrite").parquet(dest)  # legacy layout
    assert not os.path.islink(dest)
    write_audit_publish(spark, o, dest, _audits())
    assert os.path.islink(dest)
    assert spark.read.parquet(dest).count() == o.count()
    assert os.path.isdir(f"{dest}_v0")  # legacy content preserved


def test_concurrent_publisher_loses_cas_and_store_stays_readable(
    spark, tmp_path
):
    """VERDICT r7 #4: a writer that loses the exclusive-create CAS on
    its OCC-snapshotted version fails loudly BEFORE touching the
    serving copy; the winner's content keeps serving and the loser's
    staged copy is kept."""
    dest = str(tmp_path / "wap_race")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_audit_publish(spark, o, dest, _audits())
    assert latest_version(dest + "_log") == 1
    n = spark.read.parquet(dest).count()

    # a concurrent writer commits v2 while our transaction is in
    # flight (injected from inside an audit, i.e. between our OCC read
    # snapshot and our commit)
    def claim_v2_midflight(df):
        commit_exclusive(dest + "_log", 2, {"writer_pid": -1})
        return 0

    smaller = o.limit(10)
    with pytest.raises(ConcurrentWriteError):
        write_audit_publish(
            spark, smaller, dest,
            {**_audits(), "zz_concurrent": claim_v2_midflight},
        )
    # serving copy untouched by the loser
    assert spark.read.parquet(dest).count() == n
    # loser's staged copy kept for inspection
    import glob

    assert glob.glob(f"{dest}_staging_*")

    # the NEXT publish claims v3 and succeeds
    write_audit_publish(spark, smaller, dest, _audits())
    assert latest_version(dest + "_log") == 3
    assert spark.read.parquet(dest).count() == 10


def test_threaded_double_publish_invariants(spark, tmp_path):
    """True two-writer race (same process, two threads): whatever the
    interleaving, the invariants hold — log versions are unique and
    gapless from 1, dest always readable, and its content equals one
    of the two writers' frames."""
    import threading

    dest = str(tmp_path / "wap_thread_race")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    frames = {"a": o.limit(100), "b": o.limit(200)}
    errors: dict[str, Exception] = {}
    barrier = threading.Barrier(2)

    def publish(key):
        try:
            barrier.wait()
            write_audit_publish(spark, frames[key], dest, _audits())
        except ConcurrentWriteError as e:
            errors[key] = e

    ts = [threading.Thread(target=publish, args=(k,)) for k in frames]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    winners = 2 - len(errors)
    assert winners >= 1
    assert latest_version(dest + "_log") == winners
    assert spark.read.parquet(dest).count() in (100, 200)


def test_old_versions_are_swept_past_retention(spark, tmp_path):
    """r8 review finding #7: successful publishes garbage-collect
    version directories beyond the retained window (current +
    previous), so a long-lived destination does not accumulate a full
    table copy per publish."""
    dest = str(tmp_path / "wap_gc")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    for k in (10, 20, 30, 40):
        write_audit_publish(spark, o.limit(k), dest, _audits())
    assert spark.read.parquet(dest).count() == 40
    assert not os.path.exists(f"{dest}_v1")
    assert not os.path.exists(f"{dest}_v2")
    assert os.path.isdir(f"{dest}_v3") and os.path.isdir(f"{dest}_v4")


def test_sweep_survives_version_gap_from_crashed_claim(spark, tmp_path):
    """ADVICE r8: version numbers are not dense — a CAS-claimed-but-
    crashed publish leaves a numbering gap with no directory. The
    sweep must retain the N highest EXISTING version directories, so
    the previously-serving version survives even when the arithmetic
    window (v <= version - N) would have swept it."""
    orders = load_table(spark, SF_DIR, "orders").limit(100)
    dest = str(tmp_path / "t")
    write_audit_publish(spark, orders, dest, _audits())  # v1 serves
    # crashed publisher: claimed v2, died before staging its content
    commit_exclusive(dest + "_log", 2, {"crashed": True})
    write_audit_publish(spark, orders, dest, _audits())  # lands v3
    assert latest_version(dest + "_log") == 3
    assert os.path.isdir(f"{dest}_v3")
    # v1 was serving until a moment ago: it MUST survive the sweep
    # (old arithmetic: 1 <= 3-2 would have deleted it mid-scan)
    assert os.path.isdir(f"{dest}_v1")
    assert read_published(spark, dest).count() == 100


def test_sweep_ignores_concurrent_unpublished_higher_version(
    spark, tmp_path
):
    """A concurrent publisher between its version rename and pointer
    swap leaves a directory ABOVE the just-published version: the
    sweep must not count it toward retention, or the previous serving
    version would be reclaimed from under mid-scan readers (r9
    review)."""
    import shutil

    orders = load_table(spark, SF_DIR, "orders").limit(100)
    dest = str(tmp_path / "t")
    write_audit_publish(spark, orders, dest, _audits())  # v1
    # concurrent publisher's renamed-but-unpublished v99
    shutil.copytree(f"{dest}_v1", f"{dest}_v99")
    write_audit_publish(spark, orders, dest, _audits())  # v2 publishes
    # retained window below v2: {v2, v1} — v1 must survive
    assert os.path.isdir(f"{dest}_v1")
    assert os.path.isdir(f"{dest}_v2")
    assert os.path.isdir(f"{dest}_v99")  # not this sweep's to touch
    assert read_published(spark, dest).count() == 100
