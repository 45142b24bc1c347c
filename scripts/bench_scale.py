"""Scale-stress bench: the heavy operator families at sf0.1 vs sf1.

Turns the "survives 100x" plan arguments into measured evidence: runs
each heavy query at both scale factors in the SAME process (one warm
session per sf, sf0.1 first), computes the implied scaling exponent
    alpha = log(t_sf1 / t_sf0.1) / log(10)
and writes BENCH_SF1.json. alpha ~ 1 is linear scaling; alpha <= ~1.2
passes (shuffle/log factors); anything above names a problem.

Fixed per-run overhead (session, plan compile, Python pool spin-up)
deflates small-t queries' exponents and inflates nothing, so a LOW
alpha on a sub-second query is not evidence by itself — the table
records raw seconds too.

Usage: python scripts/bench_scale.py  (expects .scaledata/sf1 from
scripts/gen_scale.py; writes BENCH_SF1.json at the repo root)
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

HEAVY = [
    # dedup family
    "doc_minhash_candidates",
    "doc_incremental_dedup",
    "doc_ngram_jaccard",
    "doc_simhash_pairs",
    "doc_neardup_components",
    # ANN family
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_mmr_diversified",
    # graph family
    "part_pagerank",
    "part_triangle_count",
    # similarity
    "item_cosine_similarity",
    # layout / maintenance
    "lineitem_compaction_roundtrip",
]


def run_bench(sf_dir: str) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_QUERIES=",".join(HEAVY),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"]


def main() -> None:
    sf01 = os.environ.get("SCALE_BASE_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SCALE_BIG_DIR", str(REPO / ".scaledata" / "sf1"))
    ratio = float(os.environ.get("SCALE_RATIO", "10"))
    t_small = run_bench(sf01)
    t_big = run_bench(sf1)
    rows = {}
    for q in HEAVY:
        a, b = t_small.get(q), t_big.get(q)
        alpha = (
            round(math.log(b / a) / math.log(ratio), 3)
            if a and b and a > 0
            else None
        )
        rows[q] = {"sf0.1_sec": a, "sf1_sec": b, "exponent": alpha}
    art = {
        "metric": "scale_stress_exponent",
        "ratio": ratio,
        "queries": rows,
        "max_exponent": max(
            r["exponent"] for r in rows.values() if r["exponent"] is not None
        ),
    }
    (REPO / "BENCH_SF1.json").write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
