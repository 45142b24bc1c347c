"""Spark-side trained-tier recall on the clustered fixture (r12,
VERDICT r11 #2's "RECALL_SCALE section for the clustered fixture"):
runs the REGISTERED trained-tier configs (scaled C + "auto" mass
schedule — the exact plans the driver checks) against the
mixture-of-Gaussians corpus scripts/ivfpq_clustered_calibration.py
writes, and records recall@10 plus the measured serve cost under a
"clustered" key in RECALL_SCALE.json (the isotropic sections are
untouched). Run AFTER ivfpq_clustered_calibration.py.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

os.environ["RECALL_TIERS"] = "ivf_trained,pq_trained,ivfpq"

from ann_recall_scale import ivf_cand_frac, ivfpq_serve_frac, recalls  # noqa: E402

from bigdatafinalproject_spark.session import get_spark  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--fixtures", default="sf1,sf3,sf10,sf1_hard,sf10_hard",
        help="comma-separated .scaledata/clustered fixture names "
        "(r13: sf3/sf10 cover the schedule's scale steps on "
        "clustered data — VERDICT r12 #5; *_hard are the Zipf-mass "
        "overlapping-cluster fixtures — VERDICT r12 #2)",
    )
    ap.add_argument(
        "--tiers", default="ivf_trained,pq_trained,ivfpq",
        help="RECALL_TIERS subset to measure (r14, VERDICT r13 #4: "
        "the appended-drift tiers run on the hard fixtures with "
        "--tiers ivf_appended,pq_appended,ivfpq_appended)",
    )
    args = ap.parse_args()
    os.environ["RECALL_TIERS"] = args.tiers
    spark = get_spark(app_name="bdfp-clustered-recall")
    out = {}
    for name in args.fixtures.split(","):
        d = str(REPO / ".scaledata" / "clustered" / name)
        if not Path(d).is_dir():
            raise SystemExit(f"{d} missing - run ivfpq_clustered_calibration.py")
        row = recalls(spark, d)
        row["ivf_candidate_frac"] = ivf_cand_frac(spark, d)
        row["ivfpq_serve_frac"] = ivfpq_serve_frac(spark, d)
        out[name] = row
        print(name, json.dumps(row), flush=True)
    art_path = REPO / "RECALL_SCALE.json"
    art = json.loads(art_path.read_text())
    # carry-forward rule at TIER granularity (r14: a --tiers subset
    # run must not drop a fixture row's previously measured tiers —
    # the r13 fixture-level merge silently discarded the trained keys
    # when the appended-tier subset ran on the hard fixtures)
    prev = art.get("clustered", {}).get("tiers", {})
    art["clustered"] = {
        "fixture": "scripts/ivfpq_clustered_calibration.py mixture "
                   "(N/200 unit-norm Gaussian clusters, sigma=0.08); "
                   "*_hard = Zipf(s=1) masses + sigma=0.25 overlap "
                   "(r13, VERDICT r12 #2)",
        "tiers": {
            **prev,
            **{n: {**prev.get(n, {}), **row} for n, row in out.items()},
        },
    }
    art_path.write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps(art["clustered"]))


if __name__ == "__main__":
    main()
