"""Property pins for PII redaction and segment-level dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.dedup import segment_dedup
from bigdatafinalproject_spark.operators.privacy import (
    inject_synthetic_pii,
    redact_pii,
)
from bigdatafinalproject_spark.operators.text import norm_text
from tests.conftest import SF_DIR


def test_redact_pii_removes_all_injected_pii(spark):
    """After scrubbing, no @-address, dotted-quad, or 555- phone shape
    survives, and every third doc (the injected ones) counted >= 1 of
    each."""
    d = load_table(spark, SF_DIR, "documents")
    dirty = d.select(
        "doc_id", inject_synthetic_pii(d, "text", "doc_id", "source").alias("t")
    )
    out = redact_pii(dirty, "t", "doc_id")
    leftovers = out.filter(
        F.col("clean_text").rlike("@")
        | F.col("clean_text").rlike(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+")
        | F.col("clean_text").rlike(r"[0-9]{3}-[0-9]{4}-[0-9]{4}")
    ).count()
    assert leftovers == 0
    injected = out.filter(F.col("doc_id") % 3 == 0)
    assert (
        injected.filter(
            (F.col("n_emails") < 1) | (F.col("n_ips") < 1) | (F.col("n_phones") < 1)
        ).count()
        == 0
    )
    clean = out.filter(F.col("doc_id") % 3 != 0)
    assert clean.filter(
        (F.col("n_emails") != 0) | (F.col("n_ips") != 0) | (F.col("n_phones") != 0)
    ).count() == 0


def test_redact_pii_idempotent(spark):
    """Scrubbing already-scrubbed text changes nothing."""
    d = load_table(spark, SF_DIR, "documents")
    dirty = d.select(
        "doc_id", inject_synthetic_pii(d, "text", "doc_id", "source").alias("t")
    )
    once = redact_pii(dirty, "t", "doc_id").select(
        "doc_id", F.col("clean_text").alias("t")
    )
    twice = redact_pii(once, "t", "doc_id")
    assert twice.filter(
        (F.col("n_emails") != 0) | (F.col("n_ips") != 0) | (F.col("n_phones") != 0)
    ).count() == 0
    joined = once.join(
        twice.select("doc_id", "clean_text"), "doc_id"
    ).filter(F.col("t") != F.col("clean_text"))
    assert joined.count() == 0


def test_segment_dedup_identity_when_no_spans_repeat(spark):
    """With the frequency cap above the corpus size nothing is banned:
    clean_text must reassemble to EXACTLY the normalized original and
    n_kept == n_segs — pins the slice/reassembly arithmetic."""
    d = load_table(spark, SF_DIR, "documents")
    out = segment_dedup(d, "text", "doc_id", seg_tokens=16, max_docs=10**9)
    orig = d.select("doc_id", norm_text(F.col("text")).alias("norm"))
    bad = (
        out.join(orig, "doc_id")
        .filter(
            (F.col("clean_text") != F.col("norm"))
            | (F.col("n_kept") != F.col("n_segs"))
        )
        .count()
    )
    assert bad == 0


def test_segment_dedup_drops_only_repeated_spans(spark):
    """Kept+dropped partitions the segments; dropped segments all occur
    in >1 doc (recomputed independently)."""
    d = load_table(spark, SF_DIR, "documents")
    out = segment_dedup(d, "text", "doc_id", seg_tokens=16, max_docs=1)
    # every doc keeps <= its total and the corpus drops SOMETHING at
    # sf0.001 (74 banned spans measured) while keeping most content
    agg = out.agg(
        F.sum("n_segs").alias("t"), F.sum("n_kept").alias("k")
    ).collect()[0]
    assert 0 < agg["k"] < agg["t"]
