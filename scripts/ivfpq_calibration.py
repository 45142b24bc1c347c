"""Numpy-first calibration for extending the adaptive centroid/mass
schedule to the IVFPQ tier (r11; follow-through of the r10 verdict's
top item, whose IVF calibration pinned the frontier: sub-0.35N serve
cost at recall >= 0.95 needs the compressed-domain scan — THIS tier).

Today the composed tier runs a FIXED coarse quantizer (C=64) and a
fixed 3/10 posting-mass probe (IVFPQ_PROBE_MASS): at sf10 the ADC
scan covers ~30% of a coarsening index — cells fatten as N grows
while C doesn't. This script replays the EXACT registered-query
pipeline in numpy across the 5 scale points:

  coarse: sampled init -> 2 Lloyd rounds (L2 assign / mean update /
          empty-drop) -> cosine multi-assign r=3
  pq:     primary-assignment residuals -> id-relative codeword init
          (13-mod, 64 codewords) -> 2 grouped Lloyd rounds ->
          argmin-L2 encode of EVERY assignment's residual
  serve:  mass-budgeted probe over cosine-ranked cells -> integer ADC
          floor(dot(q,c)*1e6) + sum_s floor(dot(q_s,cw)*1e6), MAX over
          probed cells -> pool LEAST(640, 40*ceil(sqrt(N/1000))) by
          iscore/|x| -> exact rerank top-10

and sweeps {fixed C=64, scheduled C=min(512, 64*ceil(sqrt(N/2000)))}
x posting-mass budgets, recording recall@10 against brute force, the
scanned POSTING-mass fraction (the ADC serve-cost dial), and the
unique-candidate fraction.

Usage: python scripts/ivfpq_calibration.py   (after gen_scale.py)
Writes IVFPQ_CALIBRATION.json at the repo root.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ivf_centroid_calibration import POINTS, SCALE_REF, load, lloyd  # noqa: E402

REPO = Path(__file__).resolve().parents[1]

MOD = 37
ROUNDS = 2
MULTI = 3
K = 10
BASE_C = 64
C_CAP = 512

PQ_M, PQ_SUB = 16, 4
PQ_MOD, PQ_MAXC = 13, 64
PQ_ROUNDS = 2
PQ_SCALE = 1_000_000
PQ_RERANK = 40  # k * rerank base pool, scaled by ceil(sqrt(N/1000))
PQ_POOLCAP, PQ_SREF = 640, 1000

MASSES = [(1, 20), (1, 10), (3, 20), (1, 5), (3, 10)]


def grouped_lloyd(sub: np.ndarray, init: np.ndarray, rounds: int) -> list:
    """Per-subspace Lloyd over residual subvectors. ``sub`` is
    (n, m, d_sub); ``init`` is (n_cw, m, d_sub) — the sampled
    vectors' subvectors. Returns one (k_s, d_sub) codebook per
    subspace (possibly ragged after empty-drop)."""
    out = []
    for s in range(sub.shape[1]):
        out.append(lloyd(sub[:, s, :], init[:, s, :], rounds))
    return out


def run_point(name: str, ids, emb):
    n = len(ids)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / norms[:, None]
    qmask = (ids % 50 == 0) & (ids < 3200)
    qidx = np.nonzero(qmask)[0]

    qcos = unit[qidx] @ unit.T
    qcos[np.arange(len(qidx)), qidx] = -np.inf
    truth = np.argsort(-qcos, axis=1)[:, :K]

    s_sched = math.ceil(math.sqrt(n / SCALE_REF))
    s_pq = math.ceil(math.sqrt(n / PQ_SREF))
    pool = min(PQ_POOLCAP, PQ_RERANK * s_pq)

    out = {}
    seen = set()
    for c_target in (BASE_C, min(C_CAP, BASE_C * s_sched)):
        if c_target in seen:
            continue
        seen.add(c_target)
        rel = ids - ids.min()
        init_mask = (rel % MOD == 0) & (rel < MOD * c_target)
        cents = lloyd(emb, emb[init_mask].astype(np.float64), ROUNDS)
        c = len(cents)
        ucent = cents / np.linalg.norm(cents, axis=1)[:, None]

        cs = unit @ ucent.T
        assign = np.argsort(-cs, axis=1)[:, :MULTI]
        csz = np.bincount(assign.ravel(), minlength=c)
        tot = int(csz.sum())

        # primary residuals + codebook init (id-relative over corpus)
        prim = emb - cents[assign[:, 0]]
        cw_mask = (rel % PQ_MOD == 0) & (rel < PQ_MOD * PQ_MAXC)
        prim_sub = prim.reshape(n, PQ_M, PQ_SUB)
        cbs = grouped_lloyd(
            prim_sub, prim_sub[cw_mask], PQ_ROUNDS
        )

        # encode every assignment's residual per subspace (argmin L2)
        flat_i = np.repeat(np.arange(n), MULTI)
        flat_c = assign.ravel()
        res = emb[flat_i] - cents[flat_c]  # (n*MULTI, dim)
        res_sub = res.reshape(len(flat_i), PQ_M, PQ_SUB)
        codes = np.empty((len(flat_i), PQ_M), dtype=np.int32)
        for s in range(PQ_M):
            d = (
                -2.0 * res_sub[:, s, :] @ cbs[s].T
                + (cbs[s] * cbs[s]).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d, axis=1)

        # postings: cell -> row indices into flat arrays
        order = np.argsort(flat_c, kind="stable")
        sorted_c = flat_c[order]
        starts = np.searchsorted(sorted_c, np.arange(c))
        ends = np.searchsorted(sorted_c, np.arange(c), side="right")

        qrank = np.argsort(-cs[qidx], axis=1)

        for num, den in MASSES:
            budget = (num * tot + den - 1) // den
            recs, cand_fracs, scan_fracs = [], [], []
            for t, (qi, row) in enumerate(zip(qidx, qrank)):
                cum = np.cumsum(csz[row])
                probed = row[cum - csz[row] < budget]
                rows = np.concatenate(
                    [order[starts[p]:ends[p]] for p in probed]
                )
                scan_fracs.append(len(rows) / tot)
                # integer ADC: qcv per probed cell + per-subspace table
                qcv = np.floor(emb[qi] @ cents[probed].T * PQ_SCALE)
                qcv_of = dict(zip(probed.tolist(), qcv.tolist()))
                q_sub = emb[qi].reshape(PQ_M, PQ_SUB)
                radc = np.zeros(len(rows))
                for s in range(PQ_M):
                    tab = np.floor(cbs[s] @ q_sub[s] * PQ_SCALE)
                    radc += tab[codes[rows, s]]
                iscore = radc + np.array(
                    [qcv_of[cc] for cc in flat_c[rows]]
                )
                nb = flat_i[rows]
                keep = nb != qi
                nb, iscore = nb[keep], iscore[keep]
                # MAX over probed cells per neighbor
                uniq, inv = np.unique(nb, return_inverse=True)
                best = np.full(len(uniq), -np.inf)
                np.maximum.at(best, inv, iscore)
                cand_fracs.append(len(uniq) / n)
                sc = best / norms[uniq]
                top_pool = uniq[np.argsort(-sc, kind="stable")[:pool]]
                ex = unit[qi] @ unit[top_pool].T
                top = top_pool[np.argsort(-ex)[:K]]
                recs.append(len(set(top) & set(truth[t])) / K)
            out[f"C{c_target}_mass{num}_{den}"] = {
                "C_effective": int(c),
                "recall_at_10": round(float(np.mean(recs)), 3),
                "scan_frac": round(float(np.mean(scan_fracs)), 4),
                "cand_frac": round(float(np.mean(cand_fracs)), 4),
                "pool": pool,
            }
            print(
                f"{name} N={n} C={c_target}(eff {c}) mass={num}/{den}: "
                f"recall={np.mean(recs):.3f} scan={np.mean(scan_fracs):.3f} "
                f"cand={np.mean(cand_fracs):.3f} pool={pool}",
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
        results[name] = run_point(name, ids, emb)
    with open(REPO / "IVFPQ_CALIBRATION.json", "w") as f:
        json.dump(
            {
                "metric": "ivfpq_adaptive_schedule_calibration",
                "rule": (
                    f"C = min({C_CAP}, {BASE_C} * ceil(sqrt(N / "
                    f"{SCALE_REF}))); mass per IVF_MASS_SCHEDULE"
                ),
                "points": results,
            },
            f,
            indent=1,
        )
    print("wrote IVFPQ_CALIBRATION.json")


if __name__ == "__main__":
    main()
