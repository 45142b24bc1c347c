"""PII redaction for training-data pipelines (net-new surface,
BASELINE.json north star; no reference equivalent — the reference's
Book-Crossing pipeline carried raw user locations/ages through
unredacted, reference ALS_model3.py:75-83).

Pattern-based scrubbing of emails / phone numbers / IPv4 addresses with
per-document match counts. Everything is built-in ``regexp_replace`` /
``regexp_extract_all`` column expressions — JVM-side, codegen'd, zero
Python in the hot path, embarrassingly parallel (per-row, no shuffle).

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
repetition, no backreferences/lookaround — so the oracle replays the
exact same scrub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails contain dots (would confuse the IP pattern if
# redacted later), so scrub emails first, then IPs, then phones.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
IPV4_RE = r"[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(
    df: DataFrame, text_col: str, id_col: str, out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails / IPv4s / phones from ``text_col``; returns
    (id, clean_text, n_emails, n_ips, n_phones)."""
    raw = F.col(text_col)
    # idx=0 (whole match): the patterns carry no capture groups, and
    # group 0 is also DuckDB regexp_extract_all's default.
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(raw, EMAIL_RE, EMAIL_TOKEN)
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, IPV4_TOKEN)
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    return df.select(
        F.col(id_col),
        clean.alias(out_col),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
    )


def inject_synthetic_pii(
    df: DataFrame, text_col: str, id_col: str, source_col: str, every: int = 3
) -> Column:
    """Deterministic dirty-text column: docs where ``id % every == 0``
    get an email / phone / IPv4 derived from their own key appended.

    The test corpus is sanitized lowercase prose with no PII in it, so
    the scrub operator is exercised against PII derived deterministically
    from the data itself — both engines (Spark and the DuckDB oracle)
    build the identical dirty text, then the scrub provably removes it.
    """
    i = F.col(id_col)
    # every numeric is cast to string explicitly (ANSI mode disallows
    # implicit numeric->string coercion inside concat)
    email = F.concat(
        F.col(source_col), F.lit(".u"), i.cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit("555-"),
        F.lpad((i % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(((i * 7) % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        (F.lit(10) + i % 240).cast("string"),
        F.lit("."),
        (i % 256).cast("string"),
        F.lit("."),
        ((i * 3) % 256).cast("string"),
        F.lit("."),
        (F.lit(1) + i % 254).cast("string"),
    )
    dirty = F.concat_ws(
        " ", F.col(text_col), F.lit("email"), email, F.lit("phone"), phone,
        F.lit("ip"), ip,
    )
    return F.when(i % every == 0, dirty).otherwise(F.col(text_col))
