"""Synthetic WSI-bag dataset generator for tests and benchmarks.

Writes the exact on-disk layout the real pipeline consumes (SURVEY.md §2.3):
feature files per slide (.npy), a label csv (patient_id, pathology_id, t, e),
split .npz files, per-patient cluster ids, per-slide kNN graphs (.npz), and
region coords — with a planted survival signal so models can learn a
nontrivial C-index.
"""
from __future__ import annotations

import os
import os.path as osp

import numpy as np
import pandas as pd


def make_synthetic_dataset(root: str, n_patients: int = 40, dim: int = 1024,
                           min_regions: int = 8, max_regions: int = 64,
                           event_frac: float = 0.65, seed: int = 0,
                           n_clusters: int = 8, with_graph: bool = True,
                           n_folds: int = 1, feat_format: str = "npy",
                           time_noise: float = 5.0) -> dict:
    """Build a synthetic dataset under ``root``; returns a config-path dict.

    Bag sizes are multiples of 16 (region structure). The survival time is a
    monotone function of the mean of the first 8 feature channels, so a MIL
    pool + linear head can recover the ordering.
    """
    rng = np.random.default_rng(seed)
    feat_dir = osp.join(root, "feats")
    cluster_dir = osp.join(root, "clusters")
    graph_dir = osp.join(root, "graphs")
    coord_dir = osp.join(root, "coords")
    for d in [feat_dir, cluster_dir, graph_dir, coord_dir]:
        os.makedirs(d, exist_ok=True)

    rows = []
    pids = [f"P{i:04d}" for i in range(n_patients)]
    for i, pid in enumerate(pids):
        n_regions = int(rng.integers(min_regions, max_regions + 1))
        n = n_regions * 16
        signal = rng.uniform(-1.0, 1.0)
        feats = rng.normal(0, 1, size=(n, dim)).astype(np.float32)
        feats[:, :8] += signal
        t = float(np.clip(50.0 * (1.0 + signal) + rng.normal(0, time_noise),
                          1.0, 120.0))
        e = int(rng.uniform() < event_frac)
        sid = f"S{i:04d}"
        if feat_format == "pt":
            # reference on-disk format (reference utils/io.py:78-101)
            import torch
            torch.save(torch.from_numpy(feats),
                       osp.join(feat_dir, f"{sid}.pt"))
        else:
            np.save(osp.join(feat_dir, f"{sid}.npy"), feats)
        rows.append({"pathology_id": sid, "patient_id": pid, "e": e, "t": t})
        # cluster ids (patient-level file, like tools/deepattnmisl_cluster.py).
        # Guarantee every cluster is non-empty when n >= n_clusters: real
        # k-means clusters are never empty, and the reference DeepAttMISL
        # crashes on zero-size clusters (conv2d on a [1, d, 1, 0] input,
        # reference model/backbone.py:110-113 checks emptiness only AFTER the
        # conv). Deterministic overwrite of the first k entries — consumes no
        # extra RNG draws, so the feature/label stream is unchanged.
        cids = rng.integers(0, n_clusters, size=n).astype(np.int64)
        if n >= n_clusters:
            cids[:n_clusters] = np.arange(n_clusters)
        np.save(osp.join(cluster_dir, f"{pid}.npy"), cids)
        # region coords on a grid + per-slide kNN graph over patch coords
        side = int(np.ceil(np.sqrt(n_regions)))
        region_xy = np.stack(np.unravel_index(np.arange(n_regions), (side, side)),
                             axis=1).astype(np.float32)
        np.savez(osp.join(coord_dir, f"{sid}.npz"), coords=region_xy)
        if with_graph:
            # simple spatial chain+skip graph, [2, E] (dst, src), symmetric
            srcs, dsts = [], []
            for a in range(n):
                for b in (a - 1, a + 1, a - 4, a + 4):
                    if 0 <= b < n:
                        dsts.append(a)
                        srcs.append(b)
            ei = np.stack([np.asarray(dsts), np.asarray(srcs)]).astype(np.int64)
            np.savez(osp.join(graph_dir, f"{sid}.npz"), edge_index=ei,
                     edge_latent=ei, num_nodes=np.asarray(n))

    table_path = osp.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(table_path, index=False)

    split_paths = []
    order = rng.permutation(n_patients)
    n_test = max(2, n_patients // 5)
    n_val = max(2, n_patients // 5)
    for fold in range(n_folds):
        rolled = np.roll(order, fold * n_test)
        test = rolled[:n_test]
        val = rolled[n_test:n_test + n_val]
        train = rolled[n_test + n_val:]
        p = osp.join(root, f"split-fold{fold}.npz")
        np.savez(p, train_patients=np.asarray([pids[i] for i in train]),
                 val_patients=np.asarray([pids[i] for i in val]),
                 test_patients=np.asarray([pids[i] for i in test]))
        split_paths.append(p)

    return {
        "path_patch": feat_dir,
        "path_label": table_path,
        "path_cluster": cluster_dir,
        "path_graph": graph_dir,
        "path_coordx5": coord_dir,
        "feat_format": feat_format,
        "data_split_path": osp.join(root, "split-fold{}.npz"),
        "split_paths": split_paths,
        "pids": pids,
    }
