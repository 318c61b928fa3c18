"""Data-parallel sharding over a jax.sharding Mesh.

The reference is strictly single-GPU (SURVEY.md §2.10: no torch.distributed
anywhere; device pinned at reference model/model_handler.py:40). Here DP is
first-class and zero-copy in model code: batches are sharded over the 'data'
mesh axis, params/optimizer state are replicated, and XLA inserts the psum
for gradient reduction over ICI automatically under jit.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(dp: int, ip: int, axes=("data", "inst")) -> Mesh:
    """2-D mesh: 'data' for bag parallelism, 'inst' for instance (sequence)
    parallelism over the patch axis of very long bags (SURVEY.md §5 stretch
    goal). GSPMD partitions the pointwise embedding by instances and inserts
    the all-gather feeding the region-level attention automatically."""
    devs = jax.devices()
    assert dp * ip <= len(devs), f"need {dp * ip} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[: dp * ip]).reshape(dp, ip), axes)


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Shard bags over 'data' and the patch axis over 'inst'. Patch-axis
    arrays (feats [B, N, C], mask [B, N], cluster ids) split over N; per-bag
    arrays split over 'data' only."""
    by_n = NamedSharding(mesh, P("data", "inst"))
    by_b = NamedSharding(mesh, P("data"))

    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif hasattr(v, "ndim") and v.ndim >= 2 and k in ("feats", "mask",
                                                          "cluster_id"):
            out[k] = jax.device_put(v, by_n)
        else:
            out[k] = jax.device_put(v, by_b)
    return out


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every batch array with its leading (bag) dim split over the mesh."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sh)

    out = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = {kk: put(vv) for kk, vv in v.items()}
        elif v is None:
            out[k] = None
        else:
            out[k] = put(v)
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params/opt state) on every mesh device."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(state, sh)
