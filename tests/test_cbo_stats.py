"""ANALYZE TABLE + cost-based-optimizer statistics surface: table and
column stats are computed, persist in the catalog, and inform the
optimizer's cardinality estimates (the warehouse-engine workflow a
migrating user expects: load → ANALYZE → let the CBO plan).

Scale note: ANALYZE is one aggregate scan per table (rowCount/size)
plus one for column stats (NDV via HLL, min/max, null counts) — at
100 TB it is scheduled like any other scan and pays for itself the
first time join reordering or a broadcast decision uses the numbers.
"""

from __future__ import annotations

import pytest

from bigdatafinalproject_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def analyzed(spark):
    spark.sql("DROP TABLE IF EXISTS cbo_customer")
    load_table(spark, SF_DIR, "customer").write.mode("overwrite").saveAsTable(
        "cbo_customer"
    )
    spark.sql(
        "ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS"
    )
    yield "cbo_customer"
    spark.sql("DROP TABLE IF EXISTS cbo_customer")


def _row_count(df):
    rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
    return int(rc.get()) if rc.isDefined() else None


def test_analyze_populates_catalog_stats(spark, analyzed):
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {analyzed}").collect()
    }
    stats = desc.get("Statistics", "")
    assert "rows" in stats, f"expected row stats, got {stats!r}"
    # column-level stats: NDV recorded for the key column
    col = spark.sql(
        f"DESCRIBE EXTENDED {analyzed} c_custkey"
    ).collect()
    info = {r.info_name: r.info_value for r in col}
    assert info.get("distinct_count") not in (None, "NULL")


def test_cbo_uses_column_stats_for_selectivity(spark, analyzed):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        full = _row_count(spark.table(analyzed))
        filtered = _row_count(
            spark.table(analyzed).filter("c_nationkey = 3")
        )
        assert full is not None and full > 0
        assert filtered is not None and 0 < filtered < full, (
            "column stats should shrink the filter's cardinality "
            f"estimate (full={full}, filtered={filtered})"
        )
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
