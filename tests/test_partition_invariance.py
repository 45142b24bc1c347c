"""Partition-count invariance: the engine's determinism claim, tested
directly.

Every query result is supposed to be a pure function of the DATA —
never of spark.sql.shuffle.partitions, task scheduling, or partition
boundaries. That is what the portable-hash / decimal-sum / sequential-
fold conventions buy (NOTES.md), and it is implicitly exercised by the
suite running at 8 shuffle partitions while the driver runs its own
session (and bench runs 32). This test makes the claim explicit for
the operators whose PLANS actually change with the partition count:
prefix-sum sampling (range partitioning), dense id assignment, LSH
banding, HLL registers, the MMR greedy walk, and the deterministic
corpus shuffle.

``spark.sql.shuffle.partitions`` is a runtime conf — it is read at
execution, so re-collecting the same lazy plan after changing it
re-plans with the new value.
"""

from __future__ import annotations

import pytest

from bigdatafinalproject_spark import registry
from tests.conftest import SF_DIR

_QUERIES = [
    "doc_weighted_sample",  # distributed prefix sums + systematic marks
    "dense_customer_ids",  # range partition + per-partition offsets
    "doc_minhash_candidates",  # banded LSH bucket join
    "customer_hll_portable",  # register tables + merge
    "ann_mmr_diversified",  # sequential integer argmax walk
    "doc_shard_shuffle",  # hash shard + partitioned rank
    # r8: trained quantizers — Lloyd rounds are decimal-mean updates
    # (order-independent sums), so the trained centroids/codebooks and
    # everything downstream must be partition-count-invariant
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(repr(tuple(r[c] for c in cols)) for r in df.collect())


@pytest.mark.parametrize("name", _QUERIES)
def test_result_invariant_under_shuffle_partition_count(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _rows(registry.QUERIES[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(registry.QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} result depends on shuffle partition count"
    assert len(a) > 0
