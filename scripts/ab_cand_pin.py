"""Interleaved A/B of the candidate-tail pin modes (VERDICT r14 #3).

Runs each target query with every pin mode, modes alternating within
each rep so host heat hits all arms equally (the r14 measurement
discipline). One JSON line per query with per-mode run lists+medians.

Usage: python scripts/ab_cand_pin.py [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatafinalproject_spark import registry  # noqa: E402
from bigdatafinalproject_spark.operators import ann  # noqa: E402
from bigdatafinalproject_spark.session import get_spark  # noqa: E402

MODES = ["none", "repartition", "scaled"]
TARGETS = {
    "doc_embedding_neardup": "_NEARDUP_CAND_PIN",
    "ann_ivf_recall": "_IVF_CAND_PIN",
    "ann_ivf_topk": "_IVF_CAND_PIN",
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdfp-ab-cand-pin")
    registry.QUERIES["popular_parts"](spark, sf_dir).count()
    from bigdatafinalproject_spark.operators import arrow_kernels as _ak

    _ak.ensure_shipped(spark)
    spark.range(10_000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for qname, knob in TARGETS.items():
        default = getattr(ann, knob)
        runs: dict[str, list[float]] = {m: [] for m in MODES}
        for _ in range(reps):
            for mode in MODES:
                setattr(ann, knob, mode)
                t0 = time.perf_counter()
                registry.QUERIES[qname](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs[mode].append(round(time.perf_counter() - t0, 3))
        setattr(ann, knob, default)
        canary_t0 = time.perf_counter()
        registry.QUERIES["popular_parts"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        print(
            json.dumps(
                {
                    "query": qname,
                    "knob": knob,
                    "runs": runs,
                    "median": {
                        m: statistics.median(v) for m, v in runs.items()
                    },
                    "canary_sec": round(time.perf_counter() - canary_t0, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
