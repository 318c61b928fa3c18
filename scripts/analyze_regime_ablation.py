"""Paired regime ablation for the base_nll_abmil default-arm delta (VERDICT r4 #5).

Question: the default-regime arm's paired median Δval vs the reference is
+0.0134 at n=50 while the regime-equalized `_refregime` arm sits at +0.0056
— is true bucketed batching (vs the reference's accum-16 single-bag regime)
producing a systematic accuracy shift, or is the gap an artifact of the
median statistic on a noisy delta distribution?

Design: PARITY.json already contains the controlled ablation. For every
(fold, seed) the `base_nll_abmil` and `base_nll_abmil_refregime` arms train
OUR framework on the identical dataset/fold/seed/f32/threefry stack and
differ ONLY in {batch_max_size, accum_steps, accum_drop_remainder}
(scripts/run_parity.py:ours_extra vs ours_refregime) — and both arms share
the SAME reference run per pair (ref diff is exactly 0). The paired
difference ours_default − ours_refregime therefore isolates the batching
regime: optimizer-step granularity (one step per token-budget bucket batch
vs one step per 16 accumulated bags) plus the bucket-local shuffling order
that comes with it.

Usage: python scripts/analyze_regime_ablation.py [PARITY.json]
Prints the paired analysis; the resulting note lives in PARITY.md.
"""
import json
import sys
from math import comb

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "PARITY.json"
    d = json.load(open(path))
    a = {(r["fold"], r["seed"]): r for r in d["base_nll_abmil"]["rows"]}
    b = {(r["fold"], r["seed"]): r
         for r in d["base_nll_abmil_refregime"]["rows"]}
    common = sorted(set(a) & set(b))
    assert all(a[k]["ref_val"] == b[k]["ref_val"] for k in common), \
        "arms must share reference runs for the pairing to be controlled"

    da = np.array([a[k]["ours_val"] - a[k]["ref_val"] for k in common])
    db = np.array([b[k]["ours_val"] - b[k]["ref_val"] for k in common])
    dd = np.array([a[k]["ours_val"] - b[k]["ours_val"] for k in common])

    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(da), (20000, len(da)))
    ci = lambda x: np.percentile(x, [2.5, 97.5])
    bm_a = np.median(da[idx], axis=1)
    bm_d = np.median(dd[idx], axis=1)
    bm_gap = np.median(da[idx], axis=1) - np.median(db[idx], axis=1)

    print(f"paired (fold,seed) n = {len(common)}")
    print(f"default-arm Δval median {np.median(da):+.4f} "
          f"(95% CI [{ci(bm_a)[0]:+.4f}, {ci(bm_a)[1]:+.4f}]), "
          f"mean {da.mean():+.4f}, sd {da.std():.4f}")
    print(f"refregime-arm Δval median (same pairs) {np.median(db):+.4f}")
    print(f"paired regime effect (ours_default − ours_refregime): "
          f"median {np.median(dd):+.4f} "
          f"(95% CI [{ci(bm_d)[0]:+.4f}, {ci(bm_d)[1]:+.4f}]), "
          f"mean {dd.mean():+.4f} ± {dd.std(ddof=1)/np.sqrt(len(dd)):.4f} SE")
    print(f"arm-median gap, paired bootstrap: "
          f"{np.median(da) - np.median(db):+.4f} "
          f"(95% CI [{ci(bm_gap)[0]:+.4f}, {ci(bm_gap)[1]:+.4f}])")
    nz = dd[dd != 0]
    npos, n = int((nz > 0).sum()), len(nz)
    p = min(1.0, sum(comb(n, k)
                     for k in range(min(npos, n - npos) + 1)) / 2 ** (n - 1))
    print(f"sign test on the paired regime effect: n={n}, pos={npos}, "
          f"two-sided p={p:.3f}")


if __name__ == "__main__":
    main()
