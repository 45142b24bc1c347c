"""Numpy-first calibration for the IVF centroid-count scaling rule
(r11, the r10 verdict's top item).

The r10 mass-probe retune holds recall@10 at 0.955-0.972 flat across
the 100x span, but at a serve cost of ~0.66N unique full-vector
candidates per query: C saturates at max_centroids=64 while N grows,
so mass-per-cell inflates and a 3/10 posting-mass budget probes a
third of the corpus. Classic IVF sizing grows C with sqrt(N); this
script replays the EXACT registered-query pipeline (sampled init ->
2 deterministic Lloyd rounds (L2 assign, mean update, empty cells
drop) -> cosine multi-assign r=3 -> mass-budgeted probe -> exact
rerank) in numpy across the 5 scale points and sweeps

    C = min(cap, 64 * ceil(sqrt(N / 2000)))   x   mass budgets

recording recall@10 against brute force AND the measured unique-
candidate fraction (the serve-cost dial the budget controls).
scale_ref=2000 is sf0.1's corpus size, so s=1 there and every
already-green small-SF artifact is bit-preserved by construction.

Target (r10 verdict #1): recall >= 0.95 at ALL 5 points with
candidate mass <= 0.1N at sf10. Usage:

    python scripts/ivf_centroid_calibration.py   (after gen_scale.py)

Writes IVF_CALIBRATION.json at the repo root.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]

POINTS = {
    "sf0.1": REPO.parent / "testdata" / "sf0.1",
    "sf0.3": REPO / ".scaledata" / "sf0.3",
    "sf1": REPO / ".scaledata" / "sf1",
    "sf3": REPO / ".scaledata" / "sf3",
    "sf10": REPO / ".scaledata" / "sf10",
}

MOD = 37
ROUNDS = 2
MULTI = 3
K = 10
SCALE_REF = 2000  # sf0.1's N: s=1 there -> small SFs bit-preserved
BASE_C = 64

CAPS = [64, 256, 512, 1024]
MASSES = [(1, 20), (1, 10), (3, 20), (1, 5), (3, 10)]


def load(sf_dir: Path):
    t = pq.read_table(sf_dir / "embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    emb = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], emb[order]


def lloyd(emb: np.ndarray, cents: np.ndarray, rounds: int) -> np.ndarray:
    """L2 assign (ties to lowest cid = argmin's first-wins), mean
    update, empty cells drop — operators/clustering.kmeans_centroids."""
    for _ in range(rounds):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
        d = (
            -2.0 * emb @ cents.T
            + (cents * cents).sum(axis=1)[None, :]
        )
        a = np.argmin(d, axis=1)
        keep = np.unique(a)
        cents = np.stack([emb[a == c].mean(axis=0) for c in keep])
    return cents


def run_point(name: str, ids, emb, caps, masses):
    n = len(ids)
    norms = np.linalg.norm(emb, axis=1)
    qmask = (ids % 50 == 0) & (ids < 3200)
    qidx = np.nonzero(qmask)[0]
    unit = emb / norms[:, None]

    # exact ground truth top-K (excluding self)
    qcos = unit[qidx] @ unit.T
    qcos[np.arange(len(qidx)), qidx] = -np.inf
    truth = np.argsort(-qcos, axis=1)[:, :K]

    out = {}
    seen_targets = set()
    for cap in caps:
        s = math.ceil(math.sqrt(n / SCALE_REF))
        c_target = min(cap, BASE_C * s)
        if c_target in seen_targets:  # cap doesn't bind: same config
            continue
        seen_targets.add(c_target)
        rel = ids - ids.min()
        init_mask = (rel % MOD == 0) & (rel < MOD * c_target)
        cents = lloyd(emb, emb[init_mask].astype(np.float64), ROUNDS)
        c = len(cents)
        cnorm = np.linalg.norm(cents, axis=1)
        ucent = cents / cnorm[:, None]

        # multi-assign by cosine: r nearest centroids per corpus vector
        cs = unit @ ucent.T  # n x c
        assign = np.argsort(-cs, axis=1)[:, :MULTI]  # ties ~measure-zero
        csz = np.bincount(assign.ravel(), minlength=c)
        tot = int(csz.sum())

        # postings as cell -> member lists
        cell_members = [[] for _ in range(c)]
        for r in range(MULTI):
            for i, cid in enumerate(assign[:, r]):
                cell_members[cid].append(i)
        cell_members = [np.array(m, dtype=np.int64) for m in cell_members]

        # per-query ranked cells (cosine desc, centroid_id asc implicit)
        qrank = np.argsort(-cs[qidx], axis=1)

        for num, den in masses:
            budget = (num * tot + den - 1) // den
            recs, cand_fracs = [], []
            for t, (qi, row) in enumerate(zip(qidx, qrank)):
                cum = np.cumsum(csz[row])
                probed = row[cum - csz[row] < budget]
                cand = np.unique(np.concatenate([cell_members[p] for p in probed]))
                cand = cand[cand != qi]
                cand_fracs.append(len(cand) / n)
                sc = unit[qi] @ unit[cand].T
                top = cand[np.argsort(-sc)[:K]]
                recs.append(len(set(top) & set(truth[t])) / K)
            out[f"C{c_target}_mass{num}_{den}"] = {
                "C_effective": int(c),
                "recall_at_10": round(float(np.mean(recs)), 3),
                "cand_frac": round(float(np.mean(cand_fracs)), 4),
            }
            print(
                f"{name} N={n} C={c_target}(eff {c}) mass={num}/{den}: "
                f"recall={np.mean(recs):.3f} cand_frac={np.mean(cand_fracs):.3f}",
                flush=True,
            )
    return out


def main():
    results = {}
    for name, d in POINTS.items():
        if not d.exists():
            print(f"skip {name}: {d} missing", file=sys.stderr)
            continue
        ids, emb = load(d)
        results[name] = run_point(name, ids, emb, CAPS, MASSES)
    with open(REPO / "IVF_CALIBRATION.json", "w") as f:
        json.dump(
            {
                "metric": "ivf_centroid_scaling_calibration",
                "rule": f"C = min(cap, {BASE_C} * ceil(sqrt(N / {SCALE_REF})))",
                "points": results,
            },
            f,
            indent=1,
        )
    print("wrote IVF_CALIBRATION.json")


if __name__ == "__main__":
    main()
