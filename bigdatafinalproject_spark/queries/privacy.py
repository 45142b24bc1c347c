"""Privacy / intra-document hygiene queries: PII redaction and
C4-style segment-level dedup (net-new LLM-pipeline surface,
BASELINE.json north star).

Both oracles replay the exact operator semantics in DuckDB SQL —
regex patterns live in the common Java-regex/RE2 subset, hashing is
md5-derived, and the synthetic-PII injection is derived
deterministically from the table keys so both engines build the
identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators import privacy as P
from bigdatafinalproject_spark.operators.dedup import segment_dedup
from bigdatafinalproject_spark.registry import query

# must match queries/text_dedup.py's normalization fragments
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKS = f"string_split({_NORM}, ' ')"

# ---------------------------------------------------------------------------
# PII scrub

_DIRTY_SQL = """
    CASE WHEN doc_id % 3 = 0 THEN
      concat_ws(' ', text,
        'email', source || '.u' || CAST(doc_id AS VARCHAR) || '@example.com',
        'phone', '555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0'),
        'ip', CAST(10 + doc_id % 240 AS VARCHAR) || '.'
              || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'
              || CAST(1 + doc_id % 254 AS VARCHAR))
    ELSE text END
"""


@query(
    "doc_pii_scrub",
    oracle=f"""
    WITH dirty AS (SELECT doc_id, {_DIRTY_SQL} AS t FROM documents),
    s1 AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(t, '{P.EMAIL_RE}')) AS INT)
                      AS n_emails,
                  regexp_replace(t, '{P.EMAIL_RE}', '{P.EMAIL_TOKEN}', 'g') AS t1
           FROM dirty),
    s2 AS (SELECT doc_id, n_emails,
                  CAST(len(regexp_extract_all(t1, '{P.IPV4_RE}')) AS INT) AS n_ips,
                  regexp_replace(t1, '{P.IPV4_RE}', '{P.IPV4_TOKEN}', 'g') AS t2
           FROM s1)
    SELECT doc_id,
           regexp_replace(t2, '{P.PHONE_RE}', '{P.PHONE_TOKEN}', 'g')
               AS clean_text,
           n_emails, n_ips,
           CAST(len(regexp_extract_all(t2, '{P.PHONE_RE}')) AS INT) AS n_phones
    FROM s2
    """,
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4s / phones) with per-doc match counts.

    The corpus is sanitized prose, so every third doc first gets
    synthetic PII derived from its own key appended (identically in
    both engines) — the scrub then provably removes it. Per-row
    regexp_replace chain: no shuffle, JVM codegen, trivially
    data-parallel at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    dirty = d.select(
        "doc_id",
        P.inject_synthetic_pii(d, "text", "doc_id", "source").alias("dirty"),
    )
    return P.redact_pii(dirty, "dirty", "doc_id")


# ---------------------------------------------------------------------------
# segment-level dedup (C4-style repeated-span removal)

_SEG = 16


@query(
    "doc_segment_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    seg AS (SELECT doc_id, CAST(u.i AS INT) AS seg_id,
                   array_to_string(toks[(u.i*{_SEG}+1):((u.i+1)*{_SEG})], ' ')
                       AS seg
            FROM t, LATERAL unnest(range(0, ((len(toks)-1)//{_SEG})+1)) AS u(i)),
    banned AS (SELECT seg FROM seg GROUP BY seg
               HAVING COUNT(DISTINCT doc_id) > 1),
    kept AS (SELECT s.doc_id, s.seg_id, s.seg FROM seg s
             ANTI JOIN banned b USING (seg)),
    re AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_id) AS clean_text,
                  CAST(COUNT(*) AS INT) AS n_kept
           FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(((len(toks)-1)//{_SEG})+1 AS INT) AS n_segs
            FROM t)
    SELECT tot.doc_id, coalesce(re.clean_text, '') AS clean_text,
           tot.n_segs, coalesce(re.n_kept, 0) AS n_kept
    FROM tot LEFT JOIN re USING (doc_id)
    """,
)
def doc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment dedup: drop every 16-token span occurring in
    more than one document, reassemble the survivors in order."""
    return segment_dedup(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        seg_tokens=_SEG, max_docs=1,
    )


# ---------------------------------------------------------------------------
# right-to-be-forgotten erasure propagation

_ERASE_MOD = 97  # ~1% of customers file deletion requests
_CK = 1000003  # checksum modulus (prime)


@query(
    "customer_erasure_propagation",
    oracle=f"""
    WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0),
    del_orders AS (SELECT o_orderkey FROM orders
                   WHERE o_custkey IN (SELECT c_custkey FROM del)),
    c AS (SELECT 'customer' AS table_name,
                 (SELECT COUNT(*) FROM customer) AS rows_before,
                 (SELECT COUNT(*) FROM del) AS rows_removed,
                 CAST(SUM(c_custkey % {_CK}) AS BIGINT) AS remaining_checksum
          FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM del)),
    o AS (SELECT 'orders' AS table_name,
                 (SELECT COUNT(*) FROM orders) AS rows_before,
                 (SELECT COUNT(*) FROM del_orders) AS rows_removed,
                 CAST(SUM(o_orderkey % {_CK}) AS BIGINT) AS remaining_checksum
          FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM del)),
    l AS (SELECT 'lineitem' AS table_name,
                 (SELECT COUNT(*) FROM lineitem) AS rows_before,
                 (SELECT COUNT(*) FROM lineitem
                  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)) AS rows_removed,
                 CAST(SUM((l_orderkey * 10 + l_linenumber) % {_CK}) AS BIGINT) AS remaining_checksum
          FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_orders))
    SELECT table_name, rows_before, rows_removed,
           rows_before - rows_removed AS rows_after, remaining_checksum
    FROM (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l)
    """,
)
def customer_erasure_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten ERASURE CASCADE (GDPR Art. 17 shape — the
    governance op every 100 TB personal-data store needs; absent from
    the reference, which keeps user ids forever): a deletion request
    set (~1% of customers) propagates through the FK chain
    customer → orders → lineitem via anti-joins, and the audit output
    per table carries (rows_before, rows_removed, rows_after) plus a
    portable checksum over the SURVIVING keys — proving both that
    every affected row is gone and that nothing else was touched.

    Scale shape: the deletion key set is small relative to the corpus
    (semi/anti joins shuffle on the FK, the standard shape); the
    cascade derivation (deleted orders from deleted customers) is one
    semi-join, not a driver loop. The physical rewrite tier at 100 TB
    reuses the partition-scoped machinery proven elsewhere
    (dynamic-partition-overwrite in events_incremental_rollup_refresh;
    compaction in operators/layout) — this query pins the SEMANTICS:
    exactly the cascade closure is removed, verified row-for-row by
    the checksum."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_c = c.filter(F.col("c_custkey") % _ERASE_MOD == 0).select("c_custkey")
    del_o = o.join(
        del_c, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")

    def audit(df: DataFrame, name: str, del_keys: DataFrame, on, key_expr):
        kept = df.join(del_keys, on, "left_anti")
        removed = df.join(del_keys, on, "left_semi")
        return (
            kept.agg(
                F.sum(key_expr % _CK).alias("remaining_checksum"),
                F.count(F.lit(1)).alias("rows_after"),
            )
            .crossJoin(
                F.broadcast(df.agg(F.count(F.lit(1)).alias("rows_before")))
            )
            .crossJoin(
                F.broadcast(
                    removed.agg(F.count(F.lit(1)).alias("rows_removed"))
                )
            )
            .select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_removed",
                "rows_after",
                "remaining_checksum",
            )
        )

    out_c = audit(c, "customer", del_c, "c_custkey", F.col("c_custkey"))
    out_o = audit(
        o.withColumnRenamed("o_custkey", "c_custkey"), "orders", del_c,
        "c_custkey", F.col("o_orderkey"),
    )
    out_l = audit(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem", del_o,
        "o_orderkey",
        F.col("o_orderkey") * 10 + F.col("l_linenumber"),
    )
    return out_c.unionByName(out_o).unionByName(out_l)


_KANON_K = 8


@query(
    "customer_k_anonymity",
    oracle=f"""
    WITH g0 AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY 1, 2),
    pass0 AS (
      SELECT c_mktsegment AS segment_name,
             CAST(c_nationkey AS VARCHAR) AS nation_key,
             n, 0 AS level
      FROM g0 WHERE n >= {_KANON_K}),
    g1 AS (
      SELECT c_mktsegment, SUM(n) AS n
      FROM g0 WHERE n < {_KANON_K} GROUP BY 1),
    pass1 AS (
      SELECT c_mktsegment AS segment_name, '*' AS nation_key, n, 1 AS level
      FROM g1 WHERE n >= {_KANON_K}),
    g2 AS (
      SELECT SUM(n) AS n FROM g1 WHERE n < {_KANON_K}),
    pass2 AS (
      SELECT '*' AS segment_name, '*' AS nation_key, n, 2 AS level
      FROM g2 WHERE n > 0),
    allp AS (
      SELECT * FROM pass0 UNION ALL
      SELECT * FROM pass1 UNION ALL
      SELECT * FROM pass2)
    SELECT segment_name, nation_key,
           CAST(n AS BIGINT) AS n_customers,
           CAST(level AS INT) AS level,
           CAST(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END AS INT)
               AS still_small
    FROM allp
    """,
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity generalization over the quasi-identifier pair
    (market segment, nation): every published group must hold >= k
    individuals or its quasi-identifiers are GENERALIZED up a fixed
    hierarchy — (segment, nation) → (segment, *) → (*, *) — until the
    group is large enough (the Samarati/Sweeney release discipline;
    complements the erasure cascade and PII scrub in the governance
    family). Deterministic set algebra: three aggregate levels, each
    over the under-k remainder of the previous one; the final
    catch-all is emitted regardless and flagged ``still_small`` if
    even full suppression failed to reach k (publish/withhold is then
    the caller's policy decision).

    Scale shape: level 0 is one groupBy over the table; levels 1-2
    aggregate the under-k GROUP LIST (quasi-identifier cardinality,
    not rows) — generalization cost never touches the fact table
    again."""
    k = _KANON_K
    c = load_table(spark, sf_dir, "customer")
    g0 = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    pass0 = g0.filter(F.col("n") >= k).select(
        F.col("c_mktsegment").alias("segment_name"),
        F.col("c_nationkey").cast("string").alias("nation_key"),
        "n",
        F.lit(0).alias("level"),
    )
    g1 = (
        g0.filter(F.col("n") < k)
        .groupBy("c_mktsegment")
        .agg(F.sum("n").alias("n"))
    )
    pass1 = g1.filter(F.col("n") >= k).select(
        F.col("c_mktsegment").alias("segment_name"),
        F.lit("*").alias("nation_key"),
        "n",
        F.lit(1).alias("level"),
    )
    g2 = g1.filter(F.col("n") < k).agg(F.sum("n").alias("n"))
    pass2 = g2.filter(F.col("n") > 0).select(
        F.lit("*").alias("segment_name"),
        F.lit("*").alias("nation_key"),
        "n",
        F.lit(2).alias("level"),
    )
    allp = pass0.unionByName(pass1).unionByName(pass2)
    return allp.select(
        "segment_name",
        "nation_key",
        F.col("n").cast("long").alias("n_customers"),
        F.col("level").cast("int").alias("level"),
        (F.col("n") < k).cast("int").alias("still_small"),
    )
