"""Checkpoint save/restore for (epoch, params, optimizer state) bundles.

Same best/last naming contract as the reference
(reference model/model_handler.py:645-678): one file per network,
``{run}_model{G|D}-{best|last}.ckpt`` under save_path. Two serialization
backends, selected by the ``ckpt_backend`` config key (default ``msgpack``):

* ``msgpack`` — flax msgpack, host-synchronous, dependency-light, one file.
* ``orbax`` — orbax PyTreeCheckpointer (a directory per checkpoint); for
  sharded/async multi-host settings. Both store the flax *state-dict* form,
  so either backend restores onto the same pytree templates.
"""
from __future__ import annotations

import os
import os.path as osp

import jax
from flax import serialization


def save_checkpoint(path: str, epoch: int, params, opt_state,
                    backend: str = "msgpack"):
    if backend == "orbax":
        return save_checkpoint_orbax(path, epoch, params, opt_state)
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    bundle = {"epoch": epoch,
              "params": serialization.to_state_dict(jax.device_get(params)),
              "opt_state": serialization.to_state_dict(jax.device_get(opt_state))}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(bundle))


def restore_checkpoint(path: str, params_template=None, opt_template=None,
                       backend: str = "msgpack"):
    """Returns (epoch, params, opt_state). Templates (matching pytrees) restore
    exact array types; without them raw nested dicts/arrays are returned."""
    if backend == "orbax":
        return restore_checkpoint_orbax(path, params_template, opt_template)
    with open(path, "rb") as f:
        bundle = serialization.msgpack_restore(f.read())
    return _finish_restore(bundle, params_template, opt_template)


def _finish_restore(bundle, params_template, opt_template):
    epoch = int(bundle["epoch"])
    params = bundle["params"]
    opt_state = bundle.get("opt_state")
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    if opt_template is not None and opt_state is not None:
        # the most common structural mismatch: `opt_flatten` differed between
        # save and resume (flattened optimizers keep one fused mu/nu vector
        # where the per-leaf build keeps a param-shaped tree). from_state_dict
        # does NOT reliably raise on such mismatches — it can silently graft
        # dict leaves into the template — so check the tree structure and
        # surface the knob instead of a delayed pytree error at step time.
        mismatch = (
            "optimizer-state layout in the checkpoint does not match the "
            "rebuilt optimizer. If this checkpoint was saved with a "
            "different `opt_flatten` setting (it changes the elementwise "
            "optimizer state to one fused vector), set `opt_flatten` to "
            "match the saving run and retry.")
        try:
            restored = serialization.from_state_dict(opt_template, opt_state)
        except (KeyError, ValueError) as e:
            raise ValueError(f"{mismatch} Original error: {e}") from e
        if (jax.tree_util.tree_structure(restored)
                != jax.tree_util.tree_structure(opt_template)):
            raise ValueError(mismatch)
        opt_state = restored
    return epoch, params, opt_state


def save_checkpoint_orbax(path: str, epoch: int, params, opt_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(osp.abspath(path),
               {"epoch": epoch,
                "params": serialization.to_state_dict(jax.device_get(params)),
                "opt_state": serialization.to_state_dict(
                    jax.device_get(opt_state))},
               force=True)


def restore_checkpoint_orbax(path: str, params_template=None,
                             opt_template=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    bundle = ckptr.restore(osp.abspath(path))
    return _finish_restore(bundle, params_template, opt_template)
