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
    # staged copy kept for debugging
    staged = dest + "_staging"
    assert os.path.isdir(staged)
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
