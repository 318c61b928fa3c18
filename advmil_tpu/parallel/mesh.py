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
