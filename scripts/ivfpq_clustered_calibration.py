"""Clustered-corpus calibration for the adaptive centroid/mass
schedule (r12, VERDICT r11 #2).

Every conclusion of IVF_CALIBRATION / IVFPQ_CALIBRATION — "recall at
fixed mass SATURATES in C", the C = min(512, 64*ceil(sqrt(N/2000)))
cap, the mass step-down schedule — was measured on the driver's
ISOTROPIC synthetic embeddings (unit vectors with no cluster
structure, the hard regime for space-partitioning ANN). Real
embedding corpora are clustered; there, growing C buys genuine
selectivity, and the question the r11 verdict pinned is whether the
cap binding at sf10 (512 vs the uncapped 640) costs recall or mass on
such data.

This script builds a deterministic mixture-of-vMF-like fixture
(k = N/200 Gaussian clusters on the unit sphere, sigma chosen so
within-cluster cosine ~0.75 vs cross-cluster ~0, unit-normalized —
same N/d/dtype/schema as the driver's sf1 and sf10 embeddings), then
replays the EXACT registered IVFPQ pipeline in numpy (the
ivfpq_calibration.py machinery: sampled init -> 2 Lloyd rounds ->
3x multi-assign -> grouped residual Lloyd -> integer ADC ->
mass-budgeted probe -> exact rerank) sweeping

    C in {64 fixed, scheduled-capped, scheduled-UNCAPPED}  x  masses

and records recall@10, scanned posting mass, and unique-candidate
mass. Writes IVFPQ_CALIBRATION_CLUSTERED.json at the repo root; the
Spark-side trained-tier recall rows for the same fixture live in
RECALL_SCALE.json under "clustered" (scripts/clustered_recall.py).

Usage: python scripts/ivfpq_clustered_calibration.py
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ivf_centroid_calibration import SCALE_REF, lloyd  # noqa: E402
from ivfpq_calibration import (  # noqa: E402
    BASE_C,
    C_CAP,
    K,
    MASSES,
    MOD,
    MULTI,
    PQ_M,
    PQ_MAXC,
    PQ_MOD,
    PQ_POOLCAP,
    PQ_RERANK,
    PQ_ROUNDS,
    PQ_SCALE,
    PQ_SREF,
    PQ_SUB,
    ROUNDS,
    grouped_lloyd,
)

REPO = Path(__file__).resolve().parents[1]

DIM = 64
SEED = 20260816
CLUSTER_SPAN = 200  # docs per cluster: k = N / 200
SIGMA = 0.08  # per-dim noise; noise norm ~ sigma*sqrt(d) ~ 0.64

# r13 HARD variants (VERDICT r12 #2): the r12 mixture (equal masses,
# well-separated) read recall 1.000 everywhere — zero discriminating
# power. Real embedding corpora have POWER-LAW cluster masses and
# overlapping clusters; the hard fixture has both:
# - Zipf(s=1) cluster sizes: the head cluster holds ~1/H(k) of the
#   corpus (~19% at k=100), the binding case for the mass-budgeted
#   probe (a fat head cell can swallow the whole budget);
# - per-dim sigma=0.25: noise norm ~ 0.25*sqrt(64) = 2.0 vs ~1.41
#   mean inter-center distance on S^63 — heavily overlapping (within-
#   cluster cosine ~0.2 vs ~0 across), so coarse assignment is
#   genuinely ambiguous instead of trivially separable.
SIGMA_HARD = 0.25
ZIPF_S = 1.0

# (name, n, sigma, zipf): sf3 joins so the Spark twins cover the
# schedule's scale-step boundaries on clustered data (VERDICT r12 #5)
FIXTURES = {
    "sf1": (20_000, SIGMA, False),
    "sf3": (60_000, SIGMA, False),
    "sf10": (200_000, SIGMA, False),
    "sf1_hard": (20_000, SIGMA_HARD, True),
    "sf10_hard": (200_000, SIGMA_HARD, True),
}


def _zipf_counts(n: int, k: int, s: float = ZIPF_S) -> np.ndarray:
    """Largest-remainder apportionment of n points over k clusters
    with Zipf(s) proportions — deterministic, sums to n exactly."""
    w = 1.0 / np.arange(1, k + 1) ** s
    p = w / w.sum()
    counts = np.floor(p * n).astype(np.int64)
    rem = n - counts.sum()
    frac = p * n - counts
    counts[np.argsort(-frac)[:rem]] += 1
    return counts


def make_clustered(
    n: int, seed: int = SEED, sigma: float = SIGMA, zipf: bool = False
):
    """Deterministic mixture on the unit sphere: k = n/CLUSTER_SPAN
    unit-norm means, per-point Gaussian noise, renormalized. Returns
    (ids, emb float32 unit rows, labels). Equal-mass clusters are
    INTERLEAVED across ids (point i belongs to cluster i % k); Zipf
    masses are assigned by a seeded PERMUTATION — both keep the
    id-relative init/query sampling the pipeline uses unbiased with
    respect to cluster structure."""
    k = n // CLUSTER_SPAN
    rng = np.random.default_rng(seed + n + (7919 if zipf else 0))
    means = rng.standard_normal((k, DIM))
    means /= np.linalg.norm(means, axis=1)[:, None]
    if zipf:
        counts = _zipf_counts(n, k)
        labels = np.repeat(np.arange(k, dtype=np.int32), counts)
        labels = labels[rng.permutation(n)]
    else:
        labels = (np.arange(n) % k).astype(np.int32)
    pts = means[labels] + sigma * rng.standard_normal((n, DIM))
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    return np.arange(n, dtype=np.int64), pts.astype(np.float32), labels


def write_fixture(
    name: str, n: int, sigma: float = SIGMA, zipf: bool = False
) -> Path:
    out = REPO / ".scaledata" / "clustered" / name
    out.mkdir(parents=True, exist_ok=True)
    path = out / "embeddings.parquet"
    ids, emb, labels = make_clustered(n, sigma=sigma, zipf=zipf)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                list(emb), pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, path)
    return out


def run_point(name: str, ids, emb):
    """The ivfpq_calibration.run_point sweep, extended with the
    UNCAPPED scheduled C so the cap's cost (if any) is measured, not
    assumed."""
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
    for c_target in (
        BASE_C,
        min(C_CAP, BASE_C * s_sched),
        BASE_C * s_sched,  # uncapped: the r11 verdict's question
    ):
        if c_target in seen:
            continue
        seen.add(c_target)
        rel = ids - ids.min()
        init_mask = (rel % MOD == 0) & (rel < MOD * c_target)
        cents = lloyd(emb.astype(np.float64), emb[init_mask].astype(np.float64), ROUNDS)
        c = len(cents)
        ucent = cents / np.linalg.norm(cents, axis=1)[:, None]

        cs = unit @ ucent.T
        assign = np.argsort(-cs, axis=1)[:, :MULTI]
        csz = np.bincount(assign.ravel(), minlength=c)
        tot = int(csz.sum())

        prim = emb - cents[assign[:, 0]]
        cw_mask = (rel % PQ_MOD == 0) & (rel < PQ_MOD * PQ_MAXC)
        prim_sub = prim.reshape(n, PQ_M, PQ_SUB)
        cbs = grouped_lloyd(prim_sub, prim_sub[cw_mask], PQ_ROUNDS)

        flat_i = np.repeat(np.arange(n), MULTI)
        flat_c = assign.ravel()
        res = emb[flat_i] - cents[flat_c]
        res_sub = res.reshape(len(flat_i), PQ_M, PQ_SUB)
        codes = np.empty((len(flat_i), PQ_M), dtype=np.int32)
        for s in range(PQ_M):
            d = (
                -2.0 * res_sub[:, s, :] @ cbs[s].T
                + (cbs[s] * cbs[s]).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d, axis=1)

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
                qcv = np.floor(emb[qi] @ cents[probed].T * PQ_SCALE)
                qcv_of = dict(zip(probed.tolist(), qcv.tolist()))
                q_sub = emb[qi].astype(np.float64).reshape(PQ_M, PQ_SUB)
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--fixtures", default=None,
        help="comma-separated fixture names (default: all); fixture "
        "parquet is always (re)written for every requested name",
    )
    args = ap.parse_args()
    wanted = (
        list(FIXTURES) if args.fixtures is None
        else args.fixtures.split(",")
    )
    results, results_hard = {}, {}
    for name in wanted:
        n, sigma, zipf = FIXTURES[name]
        d = write_fixture(name, n, sigma=sigma, zipf=zipf)
        if name == "sf3":
            continue  # fixture for the Spark twins only (VERDICT #5)
        t = pq.read_table(d / "embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        emb = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
        (results_hard if zipf else results)[name] = run_point(
            name, ids, emb
        )
    # carry-forward rule (VERDICT r11 #5 / r12 #8): a sweep that
    # rewrites a shared artifact must preserve sections it did not
    # recompute this run
    art_path = REPO / "IVFPQ_CALIBRATION_CLUSTERED.json"
    art = json.loads(art_path.read_text()) if art_path.exists() else {}
    art.update(
        {
            "metric": "ivfpq_clustered_corpus_calibration",
            "fixture": (
                f"mixture of N/{CLUSTER_SPAN} unit-norm Gaussian "
                f"clusters on S^{DIM - 1}, sigma={SIGMA}, "
                f"renormalized; interleaved labels; seed={SEED}"
            ),
            "fixture_hard": (
                f"r13 (VERDICT r12 #2): Zipf(s={ZIPF_S}) cluster "
                f"masses (head ~19% of corpus at k=100) + "
                f"sigma={SIGMA_HARD} overlap (noise norm ~2.0 vs "
                f"~1.41 inter-center) — power-law AND ambiguous, the "
                "regimes the equal-mass fixture could not probe"
            ),
            "rule_under_test": (
                f"C = min({C_CAP}, {BASE_C} * ceil(sqrt(N / "
                f"{SCALE_REF}))); mass per IVF_MASS_SCHEDULE; "
                "plus the UNCAPPED scheduled C at each point"
            ),
        }
    )
    if results:
        art["points"] = {**art.get("points", {}), **results}
    if results_hard:
        art["points_hard"] = {
            **art.get("points_hard", {}), **results_hard
        }
    art_path.write_text(json.dumps(art, indent=1) + "\n")
    print("wrote IVFPQ_CALIBRATION_CLUSTERED.json")


if __name__ == "__main__":
    main()
