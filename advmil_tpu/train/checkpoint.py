"""Checkpoint save/restore for (epoch, params, optimizer state) bundles.

Same best/last naming contract as the reference
(reference model/model_handler.py:645-678): one file per network,
``{run}_model{G|D}-{best|last}.ckpt`` under save_path. Serialization is flax
msgpack (host-synchronous, dependency-light); orbax is used when requested via
``backend='orbax'`` for sharded/async multi-host settings.
"""
from __future__ import annotations

import os
import os.path as osp

import jax
from flax import serialization


def save_checkpoint(path: str, epoch: int, params, opt_state):
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    bundle = {"epoch": epoch,
              "params": serialization.to_state_dict(jax.device_get(params)),
              "opt_state": serialization.to_state_dict(jax.device_get(opt_state))}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(bundle))


def restore_checkpoint(path: str, params_template=None, opt_template=None):
    """Returns (epoch, params, opt_state). Templates (matching pytrees) restore
    exact array types; without them raw nested dicts/arrays are returned."""
    with open(path, "rb") as f:
        bundle = serialization.msgpack_restore(f.read())
    epoch = int(bundle["epoch"])
    params = bundle["params"]
    opt_state = bundle.get("opt_state")
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    if opt_template is not None and opt_state is not None:
        opt_state = serialization.from_state_dict(opt_template, opt_state)
    return epoch, params, opt_state


def save_checkpoint_orbax(path: str, epoch: int, params, opt_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(osp.abspath(path), {"epoch": epoch, "params": params,
                                   "opt_state": opt_state}, force=True)


def restore_checkpoint_orbax(path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    bundle = ckptr.restore(osp.abspath(path))
    return int(bundle["epoch"]), bundle["params"], bundle.get("opt_state")
