"""Manifest-growth measurement for the streaming micro-batch regime
(r14, VERDICT r13 #3).

Each append records per-batch provenance in the manifest — under v6/r13
that included the batch's per-cell count deltas (up to C<=512 pairs per
batch) — and every maintenance txn REWRITES the whole manifest, while
every serve PARSES it. At streaming micro-batch cadence with lazy
compaction the manifest becomes the serve- and append-side tax: this
script measures it at up to ~1,000 applied batches on a C=512 index
(the worst documented shape) and emits MANIFEST_GROWTH.json with the
curve, persisted incrementally (a crash keeps every completed
checkpoint — the r12/r13 artifact-hygiene rule).

What it measures at each checkpoint:

- ``manifest_bytes``: the _meta.json size (the per-txn rewrite and
  per-serve read amplification);
- ``parse_ms``: median wall time of 15 manifest json loads (the
  serve-side planning tax paid before any Spark work);
- ``append_s``: median wall time of the 3 appends leading into the
  checkpoint (includes the manifest rewrite, the two staged-unit
  writes, and the adopt/recommit protocol);
- ``serve_s``: median of 3 ``ivf_index_search`` runs (includes the
  file-count growth of the uncompacted unit log — the OTHER lazy-
  compaction tax, reported so the compaction-cadence bound is
  justified by data, not argument).

Usage:
  python scripts/manifest_growth.py                      # 1,000 batches
  python scripts/manifest_growth.py --batches 100 --label smoke
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DIM = 4
BATCH_ROWS = 512  # ~ touches most of the 512 cells: the worst case
BASE_ROWS = 6000
PARAMS = dict(
    centroid_mod=11, max_centroids=512, train_rounds=0, multi_assign=1
)
CHECKPOINTS = (1, 10, 50, 100, 200, 400, 700, 1000)


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("manifest-growth")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _vectors(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, lo + n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {DIM}), "
                "j -> cast(pmod(id * 7 + j * 13, 101) + 1 as float)"
                " / 102.0)"
            ).alias("embedding"),
        )
    )


def _persist(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, path)


def run(n_batches: int, label: str, out_path: str) -> dict:
    from bigdatafinalproject_spark.operators.ann_index import (
        _manifest,
        corpus_fingerprint,
        ensure_ivf_index,
        ivf_index_append,
        ivf_index_search,
    )

    spark = _session()
    work = tempfile.mkdtemp(prefix="bdfp_manifest_growth_")
    corpus_path = os.path.join(work, "corpus")
    _vectors(spark, 0, BASE_ROWS).write.mode("overwrite").parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path).cache()
    queries = corpus.filter("vec_id % 293 = 0")  # ~20 queries
    idx = os.path.join(work, "ivf_index")
    fp = corpus_fingerprint(corpus_path, **PARAMS)
    ensure_ivf_index(
        spark, corpus, idx, fp, src=corpus_path, **PARAMS
    )
    n_cells = len(_manifest(idx)["cell_sizes"])

    payload = {
        "label": label,
        "params": dict(PARAMS, batch_rows=BATCH_ROWS, dim=DIM,
                       base_rows=BASE_ROWS, cells=n_cells),
        "points": [],
    }
    _persist(out_path, payload)
    meta_path = os.path.join(idx, "_meta.json")
    append_times: list[float] = []
    for b in range(n_batches):
        lo = 1_000_000 + b * BATCH_ROWS
        t0 = time.monotonic()
        ivf_index_append(
            spark, idx, _vectors(spark, lo, BATCH_ROWS), batch_id=b
        )
        append_times.append(time.monotonic() - t0)
        done = b + 1
        if done in CHECKPOINTS or done == n_batches:
            parses = []
            for _ in range(15):
                t0 = time.monotonic()
                with open(meta_path) as f:
                    json.load(f)
                parses.append((time.monotonic() - t0) * 1000)
            serves = []
            for _ in range(3):
                t0 = time.monotonic()
                ivf_index_search(spark, idx, corpus, queries, k=5).count()
                serves.append(time.monotonic() - t0)
            point = {
                "batches": done,
                "manifest_bytes": os.path.getsize(meta_path),
                "parse_ms": round(statistics.median(parses), 3),
                "append_s": round(
                    statistics.median(append_times[-3:]), 3
                ),
                "serve_s": round(statistics.median(serves), 3),
            }
            payload["points"].append(point)
            _persist(out_path, payload)
            print(json.dumps(point), flush=True)
    spark.stop()
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=1000)
    ap.add_argument("--label", default="r13_manifest_deltas")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "MANIFEST_GROWTH.json")
    )
    args = ap.parse_args()
    out = args.out
    if os.path.exists(out):
        # never clobber a prior curve: merge under the label
        with open(out) as f:
            prior = json.load(f)
        if prior.get("label") != args.label and "curves" not in prior:
            prior = {"curves": {prior.get("label", "prior"): prior}}
        payload = run(args.batches, args.label, out + ".part")
        curves = prior.get("curves") or {prior.get("label"): prior}
        curves[args.label] = payload
        _persist(out, {"curves": curves})
        os.remove(out + ".part")
    else:
        run(args.batches, args.label, out)


if __name__ == "__main__":
    main()
