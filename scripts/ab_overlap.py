"""In-session A/B of the r14 _run_concurrent job overlap (§2.6).

Cross-process benches on this host drift 2-3x with heat (the r13
lesson), so this harness isolates the overlap INSIDE one session:
variant A monkeypatches operators.ann_index._run_concurrent to a
serial loop, variant B keeps the threaded overlap; the two variants
alternate rep-by-rep so host drift cancels in the medians.

Workload per rep (the writer-txn shapes the index family pays):
  - a cache-cleared ivfpq build (4 staged writes + cell_sizes+count)
  - a dedup build (3 distinct-shuffle writes)
  - one ivfpq append + one dedup append (staged writes per txn)

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_overlap.py [reps]
"""
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdatafinalproject_spark import registry  # noqa: E402,F401 — load
# the registry FIRST: importing a queries.* module directly while the
# registry's _load_all is mid-flight trips its oracle_of ordering check
from bigdatafinalproject_spark.catalog import load_table, table_path  # noqa: E402
from bigdatafinalproject_spark.operators import ann_index  # noqa: E402
from bigdatafinalproject_spark.session import get_spark  # noqa: E402

_THREADED = ann_index._run_concurrent


def _serial(thunks):
    return [t() for t in thunks]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdfp-ab-overlap")
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    emb.count(); docs.count()  # warm

    from bigdatafinalproject_spark.operators.ann import IVF_SCALE_REF
    from bigdatafinalproject_spark.queries.ann import (
        _PQ_M, _PQ_MAXC, _PQ_MOD,
    )
    from bigdatafinalproject_spark.queries.ivf_ranking import (
        _IVF_C, _IVF_MOD, _IVF_MULTI, _IVF_ROUNDS,
    )

    base = emb.filter(F.expr("vec_id % 3 <> 0"))
    delta = emb.filter(F.expr("vec_id % 3 = 0"))
    dbase = docs.filter(F.expr("doc_id % 3 <> 0"))
    ddelta = docs.filter(F.expr("doc_id % 3 = 0"))
    ivfpq_params = dict(
        centroid_mod=_IVF_MOD, max_centroids=_IVF_C,
        train_rounds=_IVF_ROUNDS, multi_assign=_IVF_MULTI,
        m=_PQ_M, dim=64, codeword_mod=_PQ_MOD, max_codewords=_PQ_MAXC,
        coarse_scale_ref=IVF_SCALE_REF,
    )
    dedup_params = dict(
        text_col="text", id_col="doc_id", n=5, num_hashes=12, bands=3,
        benchmark_pred="doc_id % 97 = 0", win_k=5, win_w=4,
    )
    scratch = "/tmp/bdfp_ab_overlap"

    def rep() -> float:
        shutil.rmtree(scratch, ignore_errors=True)
        t0 = time.perf_counter()
        idx = ann_index.ensure_ivfpq_index(
            spark, base, os.path.join(scratch, "ivfpq"), "abfp1",
            src=table_path(sf_dir, "embeddings"), **ivfpq_params,
        )
        ann_index.ivfpq_index_append(spark, idx, delta, batch_id=0)
        didx = ann_index.ensure_dedup_index(
            spark, dbase, os.path.join(scratch, "dedup"), "abfp2",
            src=table_path(sf_dir, "documents"), **dedup_params,
        )
        ann_index.dedup_index_append(spark, didx, ddelta, batch_id=0)
        return round(time.perf_counter() - t0, 3)

    a, b = [], []
    for i in range(reps):
        ann_index._run_concurrent = _serial
        a.append(rep())
        ann_index._run_concurrent = _THREADED
        b.append(rep())
        print(f"rep {i}: serial {a[-1]:7.3f}  overlapped {b[-1]:7.3f}")
    print("serial     med", statistics.median(a), a)
    print("overlapped med", statistics.median(b), b)


if __name__ == "__main__":
    main()
