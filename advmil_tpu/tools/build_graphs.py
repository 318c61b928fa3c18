"""Offline WSI graph construction for PatchGCN (step 2 of graph prep).

Replaces the reference's nmslib-HNSW pipeline (reference
tools/patchgcn_graph_s2.py): per slide, build radius-9 kNN edges over patch
coordinates (spatial) and over patch features (latent), saved as
``{slide}.npz`` with edge_index [2, E], edge_latent [2, E], centroid [N, 2],
num_nodes — the graph format the data layer consumes.

Differences from the reference, both deliberate:
- kNN is EXACT (native C++ for coords, accelerator-blocked matmul top-k for
  1024-d features) instead of approximate HNSW: deterministic graphs, and at
  d=1024 the MXU is faster than any CPU ANN build.
- the reference queries *coordinates* against the *feature* index for the
  latent edges (tools/patchgcn_graph_s2.py:85), producing meaningless latent
  neighbors; here latent edges are true feature-space neighbors.

Usage:
  python -m advmil_tpu.tools.build_graphs --coords DIR --feats DIR --save DIR
         [--radius 9] [--feat-format pt]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

from ..native import knn_l2
from ..utils.io import read_patch_coord, read_patch_feature


def knn_l2_device(X: np.ndarray, k: int, block: int = 2048) -> np.ndarray:
    """Exact kNN indices via blocked (q @ X^T) top-k on the accelerator."""
    import jax
    import jax.numpy as jnp
    n = X.shape[0]
    k = min(k, n)
    Xj = jnp.asarray(X, jnp.float32)
    norms = jnp.sum(Xj * Xj, axis=1)

    @jax.jit
    def blk_fn(q, qn):
        d2 = qn[:, None] + norms[None, :] - 2.0 * (q @ Xj.T)
        _, ids = jax.lax.top_k(-d2, k)
        return ids

    out = np.empty((n, k), np.int32)
    for s in range(0, n, block):
        e = min(n, s + block)
        q = Xj[s:e]
        qn = norms[s:e]
        if e - s < block:  # pad to static shape
            pad = block - (e - s)
            q = jnp.pad(q, ((0, pad), (0, 0)))
            qn = jnp.pad(qn, (0, pad))
        out[s:e] = np.asarray(blk_fn(q, qn))[: e - s]
    return out


def edges_from_knn(idx: np.ndarray) -> np.ndarray:
    """[n, k] neighbor table (self at column 0) -> [2, n*(k-1)] (dst, src),
    self-edge stripped (reference query(...)[1:])."""
    n, k = idx.shape
    a = np.repeat(np.arange(n), k - 1)
    b = idx[:, 1:].reshape(-1)
    return np.stack([a, b]).astype(np.int64)


def build_graph(coords: np.ndarray, feats: np.ndarray, radius: int = 9,
                use_device_for_feats: bool = True) -> dict:
    assert coords.shape[0] == feats.shape[0]
    n = coords.shape[0]
    spatial_idx = knn_l2(coords.astype(np.float32), min(radius, n))
    if use_device_for_feats and n > 256:
        latent_idx = knn_l2_device(feats.astype(np.float32), min(radius, n))
    else:
        latent_idx = knn_l2(feats.astype(np.float32), min(radius, n))
    return {"edge_index": edges_from_knn(spatial_idx),
            "edge_latent": edges_from_knn(latent_idx),
            "centroid": coords.astype(np.float32),
            "num_nodes": np.asarray(n)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coords", required=True, help="dir of per-slide coord .h5")
    ap.add_argument("--feats", required=True, help="dir of per-slide feature files")
    ap.add_argument("--save", required=True, help="output dir for graph .npz")
    ap.add_argument("--radius", type=int, default=9)
    ap.add_argument("--feat-format", default="pt")
    ap.add_argument("--cpu-feats", action="store_true",
                    help="use the C++ kNN for features too (no accelerator)")
    args = ap.parse_args()
    os.makedirs(args.save, exist_ok=True)
    files = sorted(f for f in os.listdir(args.coords) if f.endswith(".h5"))
    for i, fname in enumerate(files):
        sid = fname[:-3]
        coords = read_patch_coord(osp.join(args.coords, fname))
        feats = read_patch_feature(osp.join(args.feats, f"{sid}.{args.feat_format}"))
        g = build_graph(coords, feats, radius=args.radius,
                        use_device_for_feats=not args.cpu_feats)
        np.savez(osp.join(args.save, f"{sid}.npz"), **g)
        print(f"[{i + 1}/{len(files)}] {sid}: N={int(g['num_nodes'])} "
              f"E={g['edge_index'].shape[1]}")


if __name__ == "__main__":
    main()
