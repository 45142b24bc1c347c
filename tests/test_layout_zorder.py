"""Z-order clustering: the physical payoff.

Writes lineitem twice — linearly sorted on l_partkey, and z-ordered on
(l_partkey, l_suppkey) — and reads back parquet footer min/max stats.
A range predicate on the NON-leading dimension must prune files under
the z-order layout; under the linear layout every file matches (each
spans the full suppkey range). This is exactly the mechanism a
100 TB table relies on for 2-D pruning (Delta/Iceberg ZORDER); plain
parquet files + footer stats demonstrate it without a table format.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq

from bigdatafinalproject_spark.catalog import load_table
from bigdatafinalproject_spark.operators.layout import zorder_write

SF01_DIR = "/root/testdata/sf0.01"
N_FILES = 16


def _file_ranges(d: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(os.path.join(d, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def _hits(ranges: list[tuple[int, int]], lo: int, hi: int) -> int:
    return sum(1 for (a, b) in ranges if b >= lo and a <= hi)


def test_zorder_layout_prunes_non_leading_dimension(spark):
    li = load_table(spark, SF01_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    base = os.path.join(tempfile.gettempdir(), "bdfp_zorder")
    zdir, ldir = base + "_z", base + "_linear"
    zorder_write(li, zdir, "l_partkey", "l_suppkey", n_files=N_FILES, bits=11)
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    z_supp = _file_ranges(zdir, "l_suppkey")
    l_supp = _file_ranges(ldir, "l_suppkey")
    assert len(z_supp) == N_FILES and len(l_supp) == N_FILES

    # suppkey band = ~1/8 of the 1..100 range (sf0.01 has 100 suppliers)
    z_hit, l_hit = _hits(z_supp, 1, 12), _hits(l_supp, 1, 12)
    # linear-on-partkey layout: suppkey is unclustered, every file matches
    assert l_hit == N_FILES, f"expected no pruning on linear layout, got {l_hit}"
    # z-order: the band must prune at least half the files
    assert z_hit <= N_FILES // 2, f"z-order pruned too little: {z_hit}/{N_FILES}"

    # the leading dimension still prunes on BOTH layouts
    z_part = _file_ranges(zdir, "l_partkey")
    l_part = _file_ranges(ldir, "l_partkey")
    assert _hits(l_part, 1, 250) <= 4
    assert _hits(z_part, 1, 250) <= N_FILES // 2

    # correctness: both layouts hold identical data
    assert (
        spark.read.parquet(zdir).count()
        == spark.read.parquet(ldir).count()
        == li.count()
    )


def test_compact_file_count_and_disjoint_ranges(spark, tmp_path):
    """compact() must (a) hit the computed file count from the input's
    physical size, (b) with sort_col, produce files whose footer
    min/max l_orderkey ranges are pairwise disjoint (the 1-D clustering
    that makes row-group pruning work), and (c) preserve content."""
    import pyarrow.parquet as pq

    from bigdatafinalproject_spark.catalog import load_table
    from bigdatafinalproject_spark.operators.layout import compact
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    frag = str(tmp_path / "frag")
    li.repartition(16).write.parquet(frag)
    input_bytes = sum(
        f.stat().st_size for f in (tmp_path / "frag").glob("*.parquet")
    )
    target = max(1, input_bytes // 4)
    dst = str(tmp_path / "compacted")
    n = compact(spark, frag, dst, target_bytes=target, sort_col="l_orderkey")

    expected = max(1, -(-input_bytes // target))
    assert n == expected
    files = sorted((tmp_path / "compacted").glob("*.parquet"))
    assert len(files) == n

    ranges = []
    for f in files:
        md = pq.read_metadata(str(f))
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_orderkey"
            )
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # range-partitioned: disjoint up to boundary

    assert (
        spark.read.parquet(dst).count() == li.count()
    )
