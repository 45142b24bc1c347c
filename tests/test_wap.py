"""Write-Audit-Publish failure semantics: a failed audit must never
publish, must keep the staged copy for debugging, and must leave the
previously published version serving untouched."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.wap import write_audit_publish
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
    # staged copy kept for debugging (writer-unique staging dir, r8)
    import glob

    hits = glob.glob(f"{dest}_staging_*")
    assert len(hits) == 1 and os.path.isdir(hits[0])
    staged = hits[0]
    assert spark.read.parquet(staged).filter(
        F.col("o_totalprice") <= 0
    ).count() > 0

    # a corrected retry publishes over the old version
    write_audit_publish(spark, o, dest, _audits())
    assert spark.read.parquet(dest).count() == v1
    assert not os.path.isdir(staged)


def test_publish_self_heals_a_mid_swap_crash(spark, tmp_path):
    """A crash between the two publish renames leaves the table only
    at dest_prev; the next write_audit_publish call must restore it
    BEFORE doing anything else, so the previous version is never
    lost (the documented self-healing contract)."""
    dest = str(tmp_path / "wap_heal")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_audit_publish(spark, o, dest, _audits())
    n = spark.read.parquet(dest).count()
    # simulate the crash window: dest renamed away, staged never landed
    os.rename(dest, dest + "_prev")
    assert not os.path.exists(dest)
    # even a FAILING publish attempt must first heal the old version
    bad = o.withColumn("o_totalprice", F.lit(-1.0))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_audit_publish(spark, bad, dest, _audits())
    assert spark.read.parquet(dest).count() == n, "old version not healed"


def test_read_published_heals_mid_swap_crash(spark, tmp_path):
    """The read-side twin of the publish self-heal (ADVICE r7): a
    reader arriving inside the two-rename window (dest absent, _prev
    complete) must restore and serve the previous version rather than
    erroring — and must raise FileNotFoundError only when neither half
    exists."""
    from bigdatafinalproject_spark.operators.wap import read_published

    dest = str(tmp_path / "wap_read_heal")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_audit_publish(spark, o, dest, _audits())
    n = spark.read.parquet(dest).count()
    os.rename(dest, dest + "_prev")
    assert not os.path.exists(dest)
    assert read_published(spark, dest).count() == n
    # healed on disk, not just served
    assert os.path.exists(dest) and not os.path.exists(dest + "_prev")

    with pytest.raises(FileNotFoundError):
        read_published(spark, str(tmp_path / "never_published"))


def test_concurrent_publisher_loses_cas_and_store_stays_readable(
    spark, tmp_path
):
    """VERDICT r7 #4: two concurrent publishers cannot interleave. A
    writer that loses the exclusive-create CAS on the next log version
    fails loudly BEFORE touching the serving copy; the winner's
    content keeps serving and the loser's staged copy is kept."""
    from bigdatafinalproject_spark.operators.txlog import (
        ConcurrentWriteError,
        commit_exclusive,
        latest_version,
    )

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

    from bigdatafinalproject_spark.operators.txlog import (
        ConcurrentWriteError,
        latest_version,
    )

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
