"""Offline per-patient patch clustering for DeepAttnMISL.

Replaces reference tools/deepattnmisl_cluster.py: concatenate all slides of a
patient, KMeans into k clusters (seed 42), save ``{patient}.npy`` of cluster
ids. ``--backend sklearn`` (default) matches the reference's
KMeans(random_state=42) exactly; ``--backend native`` uses the C++ Lloyd
implementation (faster, deterministic, kmeans++ seeding).

Usage:
  python -m advmil_tpu.tools.cluster_patches --table CSV --feats DIR
         --save DIR [--clusters 8] [--feat-format pt] [--backend sklearn]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
import pandas as pd

from ..utils.io import read_patch_feature


def cluster_patient(feats: np.ndarray, k: int, backend: str = "sklearn",
                    seed: int = 42) -> np.ndarray:
    if backend == "native":
        from ..native import kmeans
        labels, _ = kmeans(feats, k, seed=seed)
        return labels.astype(np.int64)
    from sklearn.cluster import KMeans
    return KMeans(n_clusters=k, random_state=seed).fit_predict(feats).astype(np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="csv with patient_id/pathology_id columns")
    ap.add_argument("--feats", required=True)
    ap.add_argument("--save", required=True)
    ap.add_argument("--clusters", type=int, default=8)
    ap.add_argument("--feat-format", default="pt")
    ap.add_argument("--backend", default="sklearn",
                    choices=["sklearn", "native"])
    args = ap.parse_args()
    os.makedirs(args.save, exist_ok=True)
    df = pd.read_csv(args.table, dtype={"patient_id": str, "pathology_id": str})
    groups = df.groupby("patient_id").groups
    done = 0
    for pid, idxs in groups.items():
        paths = []
        for i in idxs:
            p = osp.join(args.feats,
                         f"{df.loc[i, 'pathology_id']}.{args.feat_format}")
            if osp.exists(p):
                paths.append(p)
        if not paths:
            print(f"[skip] no feature files for patient {pid}")
            continue
        feats = np.concatenate([read_patch_feature(p) for p in paths], axis=0)
        if len(feats) < args.clusters:
            print(f"[skip] patient {pid}: {len(feats)} < {args.clusters} patches")
            continue
        labels = cluster_patient(feats, args.clusters, backend=args.backend)
        np.save(osp.join(args.save, f"{pid}.npy"), labels)
        done += 1
        print(f"processed {done}/{len(groups)}.")


if __name__ == "__main__":
    main()
