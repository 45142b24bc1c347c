"""Versioned-snapshot CDC store: time-travel + retention semantics.

The table-format story the absent Delta/Iceberg jars would otherwise
provide, hand-rolled and pinned:

1. ``store_as_of(v)`` == replaying the source files batches 0..v
   actually contained (each snapshot's ``m=<b>`` manifest records
   them), for EVERY version — the time-travel read is exact, not
   approximate;
2. vacuum keeps the newest N snapshots, the latest store is
   bit-identical before/after, and reads of vacuumed versions fail
   loudly;
3. the final snapshot equals the one-shot batch argmax over the whole
   table (the streaming query's oracle property, re-checked here
   engine-side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.streaming.cdc import (
    _argmax,
    store_as_of,
    store_as_of_timestamp,
    store_versions,
    stream_cdc_latest_store,
    vacuum_snapshots,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(
        (r.o_custkey, r.s.o_orderdate, r.s.o_orderkey, r.s.o_totalprice)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def cdc_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cdc") / "store")
    final, n = stream_cdc_latest_store(spark, SF_DIR, out_dir=out)
    return out, final, n


def test_as_of_every_version_equals_manifest_replay(spark, cdc_store):
    out, _, n = cdc_store
    versions = store_versions(out)
    assert versions == list(range(n)) and n >= 2
    seen_files: list[str] = []
    for v in versions:
        manifest = spark.read.parquet(f"{out}/m={v}")
        seen_files += [r.file for r in manifest.collect()]
        replay = _argmax(spark.read.parquet(*sorted(set(seen_files))))
        assert _rows(store_as_of(spark, out, v)) == _rows(replay)


def test_final_version_equals_batch_argmax(spark, cdc_store):
    out, final, n = cdc_store
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    assert _rows(store_as_of(spark, out, n - 1)) == _rows(_argmax(orders))


def test_as_of_mid_version_differs_from_final(spark, cdc_store):
    """Time-travel is not a no-op: an early snapshot misses customers
    whose first order arrives in a later batch. (Must run before the
    vacuum test below — that one removes v=0 from the shared store.)"""
    out, _, n = cdc_store
    early = store_as_of(spark, out, 0).count()
    final = store_as_of(spark, out, n - 1).count()
    assert early < final


def test_changes_feed_composes_to_final_state(spark, cdc_store):
    """CDF correctness: applying the change feed (v0 -> latest) on top
    of snapshot v0 reproduces the latest snapshot exactly, and every
    change row is genuinely a change (insert keys absent from v0,
    update keys present with a different struct). (Must run before the
    vacuum test below — that one removes v=0 from the shared store.)"""
    from bigdatafinalproject_spark.streaming.cdc import store_changes

    out, _, n = cdc_store
    changes = store_changes(spark, out, 0, n - 1)
    base = {r.o_custkey: r.s for r in store_as_of(spark, out, 0).collect()}
    final = {
        r.o_custkey: r.s for r in store_as_of(spark, out, n - 1).collect()
    }
    ch = {r.o_custkey: (r.change_type, r.s) for r in changes.collect()}
    assert ch, "expected a non-empty change feed"
    for k, (typ, s) in ch.items():
        if typ == "insert":
            assert k not in base
        else:
            assert k in base and base[k] != s
    rebuilt = dict(base)
    rebuilt.update({k: s for k, (_, s) in ch.items()})
    assert rebuilt == final


def test_as_of_timestamp_resolves_to_latest_qualifying_version(spark, cdc_store):
    """TIMESTAMP AS OF semantics: for each version's own event-time
    high-water mark, the timestamp read returns the LATEST version not
    exceeding it (ties to the later version, table-format style), and
    its rows equal the VERSION AS OF read. (Must run before the vacuum
    test below — that one removes v=0 from the shared store.)"""
    out, _, n = cdc_store
    hwms = []
    for v in range(n):
        hwm = (
            store_as_of(spark, out, v)
            .agg(F.max("s.o_orderdate"))
            .first()[0]
        )
        hwms.append(hwm)
    assert hwms == sorted(hwms), "high-water mark must be monotone"
    for v, hwm in enumerate(hwms):
        df, resolved = store_as_of_timestamp(spark, out, hwm)
        expect = max(i for i, h in enumerate(hwms) if h <= hwm)
        assert resolved == expect
        assert _rows(df) == _rows(store_as_of(spark, out, resolved))


def test_as_of_timestamp_edges(spark, cdc_store):
    """Far-future timestamps resolve to the latest version; timestamps
    before the stream's first data fail loudly (same contract as a
    vacuumed VERSION AS OF read)."""
    import datetime

    out, _, n = cdc_store
    df, resolved = store_as_of_timestamp(
        spark, out, datetime.date(2999, 1, 1)
    )
    assert resolved == n - 1
    # ISO-string timestamps coerce too
    _, r2 = store_as_of_timestamp(spark, out, "2999-01-01T00:00:00")
    assert r2 == n - 1
    with pytest.raises(ValueError, match="high-water mark"):
        store_as_of_timestamp(spark, out, datetime.date(1970, 1, 1))


def test_vacuum_keeps_latest_and_fails_loudly_on_vacuumed(spark, cdc_store):
    out, _, n = cdc_store
    before = _rows(store_as_of(spark, out, n - 1))
    removed = vacuum_snapshots(out, keep=2)
    assert removed == list(range(n - 2))
    assert store_versions(out) == [n - 2, n - 1]
    # latest store unchanged by retention
    assert _rows(store_as_of(spark, out, n - 1)) == before
    # vacuumed version is gone, loudly
    with pytest.raises(ValueError, match="not retained"):
        store_as_of(spark, out, 0)
    # keep=0 is nonsense: the latest snapshot IS the store
    with pytest.raises(ValueError, match="keep"):
        vacuum_snapshots(out, keep=0)


def test_schema_evolution_mid_stream(spark, tmp_path):
    """A column added mid-stream (ADD COLUMN evolution) must not break
    the snapshot chain: the merge aligns payload fields by name (old
    rows read NULL for the new column), old snapshots stay readable,
    and the change feed across the evolution boundary treats
    NULL→value on the new column as a genuine update while NULL vs
    NULL compares equal (the null-safe compare is load-bearing here).
    """
    from bigdatafinalproject_spark.streaming.cdc import merge_snapshots

    out = str(tmp_path / "evostore")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    batch0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    # batch 1 arrives with a NEW payload column
    batch1 = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_channel", F.lit("web")
    )
    _argmax(batch0).write.mode("overwrite").parquet(f"{out}/v=0")
    merge_snapshots(
        spark.read.parquet(f"{out}/v=0"), _argmax(batch1)
    ).write.mode("overwrite").parquet(f"{out}/v=1")

    v0 = store_as_of(spark, out, 0)
    v1 = store_as_of(spark, out, 1)
    assert "o_channel" not in v0.schema["s"].dataType.fieldNames()
    assert "o_channel" in v1.schema["s"].dataType.fieldNames()
    # keys whose latest order came from batch0 carry NULL; batch1 keys
    # carry the value — and both populations exist
    chan = {
        r.o_custkey: r.s.o_channel for r in v1.collect()
    }
    assert set(chan.values()) == {None, "web"}

    # CDF across the evolution boundary: every batch1-latest key is a
    # change (insert if new, update otherwise — including keys whose
    # ONLY change is the evolved column), batch0-only keys are silent
    from bigdatafinalproject_spark.streaming.cdc import store_changes

    ch = {r.o_custkey: r.change_type for r in
          store_changes(spark, out, 0, 1).collect()}
    b1_latest = {k for k, v in chan.items() if v == "web"}
    assert set(ch) == b1_latest
    v0_keys = {r.o_custkey for r in v0.collect()}
    assert all(
        (t == "update") == (k in v0_keys) for k, t in ch.items()
    )


def test_as_of_timestamp_after_vacuum_fails_for_reclaimed_range(
    spark, cdc_store
):
    """Vacuum × TIMESTAMP AS OF interplay: after retention dropped the
    early snapshots (the vacuum test above keeps only the last two),
    an event-time read that would have resolved to a reclaimed version
    fails loudly, while timestamps at/after the oldest RETAINED
    high-water mark still resolve. (Runs after the vacuum test by file
    order — it depends on that state.)"""
    out, _, n = cdc_store
    versions = store_versions(out)
    assert versions == [n - 2, n - 1], "expects the vacuumed store"
    oldest_hwm = (
        store_as_of(spark, out, versions[0])
        .agg(F.max("s.o_orderdate"))
        .first()[0]
    )
    # resolvable: the oldest retained snapshot's own high-water mark
    df, resolved = store_as_of_timestamp(spark, out, oldest_hwm)
    assert resolved in versions
    # NOT resolvable: any instant strictly before the first retained
    # snapshot's content — that history was reclaimed
    import datetime

    with pytest.raises(ValueError, match="high-water mark"):
        store_as_of_timestamp(
            spark, out, oldest_hwm - datetime.timedelta(days=36500)
        )


def test_store_history_describes_retained_versions(spark, cdc_store):
    """DESCRIBE HISTORY surface: one row per retained version, key
    counts monotone (the store only accumulates), high-water marks
    monotone, manifests non-empty. (Runs after the vacuum test — only
    the last two versions remain, which is exactly what history must
    report.)"""
    from bigdatafinalproject_spark.streaming.cdc import store_history

    out, _, n = cdc_store
    hist = store_history(spark, out).orderBy("version").collect()
    assert [r.version for r in hist] == store_versions(out)
    keys = [r.n_keys for r in hist]
    hwms = [r.hwm for r in hist]
    assert keys == sorted(keys) and hwms == sorted(hwms)
    assert all(r.n_manifest_files >= 1 for r in hist)
    # the latest history row must describe the queryable store exactly
    latest = hist[-1]
    assert latest.n_keys == store_as_of(spark, out, n - 1).count()


def test_as_of_timestamp_string_date_is_whole_day(spark, cdc_store):
    """A date-only STRING follows the same end-of-day contract as a
    bare datetime.date: both must resolve to the same version as the
    full-day datetime, never to midnight."""
    import datetime

    out, _, n = cdc_store
    versions = store_versions(out)
    hwm = (
        store_as_of(spark, out, versions[0])
        .agg(F.max("s.o_orderdate"))
        .first()[0]
    )
    day = hwm.date()
    _, by_date = store_as_of_timestamp(spark, out, day)
    _, by_str = store_as_of_timestamp(spark, out, day.isoformat())
    _, by_dt = store_as_of_timestamp(
        spark, out, datetime.datetime.combine(day, datetime.time.max)
    )
    assert by_str == by_date == by_dt


def test_as_of_timestamp_skips_empty_snapshot(spark, cdc_store, tmp_path):
    """An EMPTY retained snapshot (crash artifact) has no high-water
    mark; the monotone walk must treat it as trivially qualifying and
    keep walking — not mask later qualifying versions."""
    import shutil

    out, _, n = cdc_store
    probe = str(tmp_path / "probe_store")
    shutil.copytree(out, probe)
    versions = store_versions(probe)
    lo = versions[0]
    # inject an empty snapshot BELOW the retained range
    empty = store_as_of(spark, probe, lo).filter(F.lit(False))
    empty.write.mode("overwrite").parquet(f"{probe}/v={lo - 1}")
    hwm = (
        store_as_of(spark, probe, versions[-1])
        .agg(F.max("s.o_orderdate"))
        .first()[0]
    )
    _, resolved = store_as_of_timestamp(spark, probe, hwm)
    assert resolved == versions[-1], "empty snapshot masked later versions"


def test_as_of_timestamp_prefers_nonempty_over_empty_above(
    spark, cdc_store, tmp_path
):
    """An empty snapshot ABOVE non-empty qualifying versions is a
    crash artifact (the store only accumulates): it must NOT be
    selected as the latest qualifying version — that would silently
    return an empty frame for a timestamp a real earlier version
    satisfies (ADVICE r7)."""
    import shutil

    out, _, n = cdc_store
    probe = str(tmp_path / "probe_store_hi")
    shutil.copytree(out, probe)
    versions = store_versions(probe)
    hi = versions[-1]
    empty = store_as_of(spark, probe, hi).filter(F.lit(False))
    empty.write.mode("overwrite").parquet(f"{probe}/v={hi + 1}")
    hwm = (
        store_as_of(spark, probe, hi).agg(F.max("s.o_orderdate")).first()[0]
    )
    snap, resolved = store_as_of_timestamp(spark, probe, hwm)
    assert resolved == hi, "empty crash-artifact snapshot won the walk"
    assert snap.count() > 0


def test_cdc_batch_commit_cas_rejects_duplicate_writer(
    spark, cdc_store
):
    """VERDICT r7 #4, CDC half: every applied batch holds an
    exclusive-create log entry; a second writer (zombie retry,
    duplicate deployment) racing for an already-committed batch id
    fails loudly and the winner's snapshot chain stays intact and
    readable."""
    from bigdatafinalproject_spark.operators.txlog import (
        ConcurrentWriteError,
        commit_exclusive,
        latest_version,
    )

    out, final, n = cdc_store
    versions = store_versions(out)
    # one log entry per committed snapshot version
    assert latest_version(f"{out}/_log") == versions[-1]
    before = store_as_of(spark, out, versions[-1]).count()
    with pytest.raises(ConcurrentWriteError):
        commit_exclusive(f"{out}/_log", versions[-1], {"writer_pid": -1})
    # a fresh (uncommitted) batch id is claimable
    commit_exclusive(f"{out}/_log", versions[-1] + 1, {"writer_pid": -1})
    # store readable throughout
    assert store_as_of(spark, out, versions[-1]).count() == before


def test_cdc_redelivered_batch_is_idempotently_skipped(spark, tmp_path):
    """r8 review finding #3: crash-recovery REDELIVERY of a committed
    batch (log entry + snapshot both present) must be a no-op skip —
    not a ConcurrentWriteError that wedges every restart — and a crash
    artifact (snapshot without commit) must be rewritten cleanly."""
    import os
    import shutil

    from bigdatafinalproject_spark.operators.txlog import has_version
    from bigdatafinalproject_spark.streaming.cdc import apply_cdc_batch

    out = str(tmp_path / "redeliver_store")
    orders = load_table(spark, SF_DIR, "orders").limit(200)

    apply_cdc_batch(spark, out, orders, 0)
    v0 = spark.read.parquet(f"{out}/v=0")
    n0 = v0.count()
    mtime = os.path.getmtime(f"{out}/v=0")

    # redelivery of the committed batch: skipped, snapshot untouched
    apply_cdc_batch(spark, out, orders, 0)
    assert os.path.getmtime(f"{out}/v=0") == mtime
    assert spark.read.parquet(f"{out}/v=0").count() == n0

    # crash artifact: content for batch 1 landed but commit didn't
    orders.limit(50).write.mode("overwrite").parquet(f"{out}/v=1")
    assert not has_version(f"{out}/_log", 1)
    apply_cdc_batch(spark, out, orders, 1)
    assert has_version(f"{out}/_log", 1)
    assert spark.read.parquet(f"{out}/v=1").count() == n0  # rewritten

    # committed-but-missing-content is a corrupted store: loud error
    shutil.rmtree(f"{out}/v=1")
    with pytest.raises(RuntimeError, match="corrupted"):
        apply_cdc_batch(spark, out, orders, 1)


def test_uncommitted_snapshot_is_invisible_to_time_travel(
    spark, tmp_path
):
    """ADVICE r8 (medium): a ``v=`` directory without a ``_log``
    commit record is a crash artifact from an attempt that died before
    its commit — apply_cdc_batch itself classifies it as invalid and
    rewrites it. Time travel must not serve it: store_versions
    excludes it, store_as_of refuses it by name, the timestamp walk
    resolves to the committed chain, and the final-state read ignores
    it."""
    import shutil

    out = str(tmp_path / "store")
    final, n = stream_cdc_latest_store(spark, SF_DIR, out_dir=out)
    committed = store_versions(out)
    assert committed == list(range(n))

    # crash artifact: content for version n with NO commit record
    # (copy an existing snapshot's bytes — content is irrelevant)
    shutil.copytree(f"{out}/v={n - 1}", f"{out}/v={n}")
    assert store_versions(out) == committed  # invisible
    with pytest.raises(ValueError, match=f"v={n} not retained"):
        store_as_of(spark, out, n)
    # the hwm walk resolves within the committed chain
    hwm = (
        spark.read.parquet(f"{out}/v={n - 1}")
        .agg(F.max("s.o_orderdate"))
        .first()[0]
    )
    _, resolved = store_as_of_timestamp(spark, out, hwm)
    assert resolved == n - 1


def test_legacy_store_without_log_lists_by_directory(spark, tmp_path):
    """A store written before the commit log existed (no _log dir)
    still time-travels by directory listing — the documented legacy
    fallback."""
    import shutil

    out = str(tmp_path / "store")
    stream_cdc_latest_store(spark, SF_DIR, out_dir=out)
    legacy = str(tmp_path / "legacy")
    shutil.copytree(out, legacy)
    shutil.rmtree(f"{legacy}/_log")
    assert store_versions(legacy) == store_versions(out)
    assert store_as_of(spark, legacy, 0).count() > 0


def test_vacuum_sweeps_uncommitted_artifacts_except_in_flight(
    spark, tmp_path
):
    """Committed-only store_versions hides crash artifacts from the
    retention walk, so vacuum must reclaim them explicitly — all but
    the max(committed)+1 slot, which may be a live writer's in-flight
    batch (r9 review)."""
    import os
    import shutil

    out = str(tmp_path / "store")
    final, n = stream_cdc_latest_store(spark, SF_DIR, out_dir=out)
    # artifact BELOW the chain head (version n-1 exists committed;
    # fake an uncommitted duplicate at n+3) and the in-flight slot n
    shutil.copytree(f"{out}/v={n - 1}", f"{out}/v={n}")       # in-flight
    shutil.copytree(f"{out}/v={n - 1}", f"{out}/v={n + 3}")   # artifact
    removed = vacuum_snapshots(out, keep=1)
    assert n + 3 in removed
    assert not os.path.exists(f"{out}/v={n + 3}")
    assert os.path.exists(f"{out}/v={n}")  # spared: possibly live
    # the committed latest is untouched
    assert os.path.exists(f"{out}/v={n - 1}")
    # AND its commit record survives the log prune: keep_from must be
    # derived from the lowest retained committed version, not from the
    # swept artifact (which sits ABOVE it) — otherwise store_versions
    # stops listing the retained snapshot and reads break (ADVICE r9)
    assert store_versions(out) == [n - 1]
    assert store_as_of(spark, out, n - 1).count() > 0
