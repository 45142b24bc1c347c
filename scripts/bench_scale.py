"""Scale-stress bench: the heavy operator families across scale factors.

Turns the "survives 100x" plan arguments into measured evidence: runs
each heavy query at every scale point in its own warm session
(smallest first), fits the scaling exponent alpha by least squares on
log t vs log sf, and writes BENCH_SF1.json. alpha ~ 1 is linear
scaling; alpha <= ~1.2 passes (shuffle/log factors); anything above
names a problem. With three points the artifact also reports r2, so a
"low exponent" produced by fixed overhead at the small end is visible
as a poor fit rather than read as evidence.

Fixed per-run overhead (session, plan compile, Python pool spin-up)
deflates small-t queries' exponents and inflates nothing, so a LOW
alpha on a sub-second query is not evidence by itself — the table
records raw seconds too.

Usage:
    python scripts/bench_scale.py
Expects .scaledata/sf1 (and optionally .scaledata/sf0.3) from
scripts/gen_scale.py; set SCALE_DIRS to override the comma-separated
point list. Writes BENCH_SF1.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import re
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
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # MMR fed from the persisted IVFPQ index (r12, VERDICT r11 #6):
    # the production-shape diversified retrieval — its scale row is
    # the index serve's (bounded panel, scheduled scan), where the
    # exact-cosine-fed twin above is ~N^2/50 by construction
    "ann_mmr_from_index",
    # persisted-index SERVE family (r13, VERDICT r12 #6): the queries
    # a deployment runs at volume — ensure (cached) + search from the
    # persisted frames. Their exponents are the 100 TB claim for the
    # serving path; sf30 adds a third decade over sf0.1
    "ann_ivf_index_search",
    "ann_pq_index_search",
    "ann_ivfpq_index_search",
    "doc_dedup_index_check",
    "ann_index_append",
    # persisted dedup index: base build + two delta appends + check —
    # the maintenance-heaviest query of the new dedup lifecycle family
    "doc_dedup_index_append",
    # maintenance WRITER family at every decade (r14, VERDICT r13 #5):
    # compaction rewrites (two-batch append + size-targeted rewrite
    # under the claim/fence protocol) and the O(manifest) retraction
    # lifecycle — the staged-append/adopt/GC path where a super-linear
    # term (file-count growth, manifest rewrite) would first surface
    "ann_pq_index_compact",
    "ann_ivfpq_index_compact",
    "ann_ivf_index_retract",
    # winnowed MOSS span fingerprints: corpus-wide gram explode +
    # per-doc window argmin + shared-fp aggregation
    "doc_winnow_spans",
    # graph family
    "part_pagerank",
    "part_triangle_count",
    # similarity
    "item_cosine_similarity",
    # layout / maintenance / governance
    "lineitem_compaction_roundtrip",
    "customer_erasure_propagation",
    "orders_incremental_join_view",
    "orders_write_audit_publish",
    "orders_price_drift",
    # streaming family: the chunked stagers keep batch COUNT fixed (4)
    # while batch SIZE grows with SF, so the exponent measures
    # per-batch cost — i.e. whether per-batch state really is bounded
    # by key cardinality (scaling batch count instead would inflate
    # the exponent by chain length × keys, a cost the design never
    # claims to bound)
    "stream_click_purchase_full_join",
    "stream_hll_user_distinct",
    "stream_orders_cdc_apply",
]


def _selected_queries() -> list[str]:
    """SCALE_QUERIES=a,b re-measures a subset (e.g. after retuning one
    operator) — the per-point merge in main() keeps every other heavy
    query's recorded reading, the same economics as SCALE_DIRS /
    RECALL_TIERS. Empty tokens are ignored; unknown names abort."""
    only = os.environ.get("SCALE_QUERIES")
    if not only:
        return HEAVY
    want = [t.strip() for t in only.split(",") if t.strip()]
    unknown = set(want) - set(HEAVY)
    if unknown:
        raise SystemExit(f"SCALE_QUERIES not in HEAVY: {sorted(unknown)}")
    return want


def run_bench(sf_dir: str) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_QUERIES=",".join(_selected_queries()),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # robust shared parse (r13 review #4): trailing stdout noise must
    # not lose a multi-decade sweep minutes in
    sys.path.insert(0, str(REPO / "scripts"))
    from bench_protocol import parse_bench_stdout

    return parse_bench_stdout(out.stdout)["queries"]


def _fit(xs: list[float], ys: list[float]) -> tuple[float, float]:
    """Least-squares slope + r^2 of y on x."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx if sxx else float("nan")
    r2 = (sxy * sxy) / (sxx * syy) if sxx and syy else 1.0
    return slope, r2


def _fit_offset(
    sfs: list[float], ts: list[float]
) -> tuple[float, float, float]:
    """Fit t = c + a*sf^alpha (fixed session/plan overhead + a power
    data term) by grid-searching c and log-log fitting the residual.
    The naive log-log exponent is DEFLATED at the small end by fixed
    overhead (r9: the two re-measured sf3 outliers fit this model at
    r2 0.99 with alpha ~1 — linear data cost under a constant
    offset, where the naive fit read r2 ~0.9). Returns
    (c, alpha, r2)."""
    a0, r0 = _fit([math.log(s) for s in sfs], [math.log(t) for t in ts])
    best = (0.0, round(a0, 3), round(r0, 3))
    lo = min(ts)
    # range guard: a sub-0.05s fastest point must fall back to the
    # plain fit (c=0), never emit NaN into the JSON artifact
    for i in range(1, max(1, int(lo * 20))):
        c = i * 0.05
        if c >= lo:
            break
        alpha, r2 = _fit(
            [math.log(s) for s in sfs], [math.log(t - c) for t in ts]
        )
        if r2 > best[2]:
            best = (round(c, 2), round(alpha, 3), round(r2, 3))
    return best


def main() -> None:
    # sf10 (r10, VERDICT r9 #4): a second decade over sf0.1 — 100× —
    # catches exponent drift the offset model could hide inside a
    # 30× span
    default_dirs = "/root/testdata/sf0.1," + ",".join(
        str(REPO / ".scaledata" / d)
        for d in ("sf0.3", "sf1", "sf3", "sf10")
        if (REPO / ".scaledata" / d).is_dir()
    )
    dirs = os.environ.get("SCALE_DIRS", default_dirs).split(",")
    points = []
    for d in dirs:
        m = re.search(r"sf([0-9.]+)", d)
        points.append((float(m.group(1)), d))
    points.sort()
    # merge with the prior artifact: a single-point run (e.g.
    # SCALE_DIRS=.scaledata/sf10 to add one decade) keeps the other
    # points' standalone readings and refits over the union
    results: dict[float, dict[str, float]] = {}
    notes: dict[str, str] = {}
    prior_path = REPO / "BENCH_SF1.json"
    if prior_path.is_file():
        prior = json.loads(prior_path.read_text())
        for q, row in prior.get("queries", {}).items():
            if "note" in row:
                notes[q] = row["note"]
            for key, t in row.items():
                m = re.fullmatch(r"sf([0-9.]+)_sec", key)
                if m and t is not None:
                    results.setdefault(float(m.group(1)), {})[q] = t
    subset_run = bool(os.environ.get("SCALE_QUERIES"))
    for sf, d in points:
        if subset_run:
            # per-QUERY merge: keep the unmeasured heavies' recorded
            # readings at this point
            results.setdefault(sf, {}).update(run_bench(d))
        else:
            results[sf] = run_bench(d)
    sfs = sorted(results)
    rows = {}
    for q in HEAVY:
        ts = [results[sf].get(q) for sf in sfs]
        entry = {f"sf{sf}_sec": t for sf, t in zip(sfs, ts)}
        # fit over the points THIS query has readings for (r13): a
        # point added for one family (sf30, serve queries) must not
        # null out every other query's exponent — each row's fit uses
        # its own non-null (sf, t) pairs, and sf_points records the
        # union
        pairs = [
            (sf, t) for sf, t in zip(sfs, ts) if t is not None and t > 0
        ]
        if len(pairs) >= 2:
            qsfs = [sf for sf, _ in pairs]
            qts = [t for _, t in pairs]
            alpha, r2 = _fit(
                [math.log(sf) for sf in qsfs], [math.log(t) for t in qts]
            )
            entry["exponent"] = round(alpha, 3)
            entry["r2"] = round(r2, 3)
            c, oalpha, or2 = _fit_offset(qsfs, qts)
            entry["fixed_sec"] = c
            entry["data_exponent"] = oalpha
            entry["data_r2"] = or2
        else:
            entry["exponent"] = None
        if q in notes:
            entry["note"] = notes[q]
        rows[q] = entry
    art = {
        "metric": "scale_stress_exponent",
        "sf_points": sfs,
        "queries": rows,
        "max_exponent": max(
            r["exponent"] for r in rows.values() if r["exponent"] is not None
        ),
    }
    (REPO / "BENCH_SF1.json").write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
