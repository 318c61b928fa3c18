"""Multi-host (DCN) initialization and global-mesh helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §2.10: no
torch.distributed anywhere). The TPU-native plan scales past one host with
``jax.distributed``: every host runs the same program, the JAX runtime wires
collectives over ICI within a slice and DCN across slices, and the data
pipeline feeds each process only its local shard of the global batch.

Config keys (all optional — absent means single-process):
  dist_init:          "auto" -> bare ``jax.distributed.initialize()``, which
                      auto-detects coordinator/rank from the TPU pod
                      metadata server (use this on real pods)
  dist_coordinator:   "host:port" of process 0
  dist_num_processes: total process count
  dist_process_id:    this process's rank
Environment fallbacks: ADVMIL_DIST_INIT / ADVMIL_COORDINATOR /
ADVMIL_NUM_PROCESSES / ADVMIL_PROCESS_ID.

Multi-host checkpointing note: only the primary process writes checkpoints,
and every process restores from ``save_path`` — on a pod, point save_path
at a filesystem shared by all hosts (e.g. NFS/GCS-fuse), or restore hangs
the primary at the next collective while non-primaries fail the load.
"""
from __future__ import annotations

import os

import numpy as np


def _lookup(cfg: dict | None, key: str, env: str):
    if cfg and cfg.get(key) is not None:
        return cfg[key]
    return os.environ.get(env)


def maybe_initialize(cfg: dict | None = None) -> bool:
    """Initialize ``jax.distributed`` when multi-process settings are present.

    Returns True when running (or now initialized) multi-process, False for
    plain single-process runs. Idempotent.
    """
    import jax

    if jax.distributed.is_initialized():
        return True
    if str(_lookup(cfg, "dist_init", "ADVMIL_DIST_INIT") or "").lower() == "auto":
        # real TPU pod: bare initialize() auto-detects from pod metadata
        jax.distributed.initialize()
        print(f"[dist] auto-initialized process {jax.process_index()} / "
              f"{jax.process_count()}")
        return jax.process_count() > 1
    num = _lookup(cfg, "dist_num_processes", "ADVMIL_NUM_PROCESSES")
    if num is None or int(num) <= 1:
        return False
    coord = _lookup(cfg, "dist_coordinator", "ADVMIL_COORDINATOR")
    pid = _lookup(cfg, "dist_process_id", "ADVMIL_PROCESS_ID")
    kwargs = {"num_processes": int(num)}
    if coord is not None:
        kwargs["coordinator_address"] = str(coord)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    print(f"[dist] initialized process {jax.process_index()} / "
          f"{jax.process_count()} ({jax.local_device_count()} local / "
          f"{jax.device_count()} global devices)")
    return True


def global_mesh(axis: str = "data"):
    """1-D mesh over ALL processes' devices (ICI within a host/slice, DCN
    across); every process must call this with the same arguments."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def process_local_slice(n_global: int) -> slice:
    """Which rows of a [n_global, ...] batch this process should load.

    n_global must divide evenly by process_count (the bucketed batcher's
    batch_multiple handles that).
    """
    import jax

    per = n_global // jax.process_count()
    assert per * jax.process_count() == n_global, \
        f"global batch {n_global} not divisible by {jax.process_count()} processes"
    start = jax.process_index() * per
    return slice(start, start + per)


def make_global_batch(local_batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble per-process host shards into global jax.Arrays sharded over
    ``axis``. Each process passes ONLY its local rows; shapes must match
    across processes. Works identically in single-process runs."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    out = {}
    for k, v in local_batch.items():
        out[k] = ({kk: put(vv) for kk, vv in v.items()}
                  if isinstance(v, dict) else put(v))
    return out


def replicate_global(tree, mesh):
    """Replicate a host-identical pytree onto every device of a (possibly
    multi-process) mesh. Each process contributes its local copy, so the
    values must be built identically on all processes (same seed)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def gather_to_hosts(tree):
    """Fetch device arrays (including cross-process sharded ones) to EVERY
    host as numpy. The call is collective: all processes must make it in the
    same order."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


def barrier(name: str = "advmil"):
    """No-op single-process; otherwise block until all processes arrive."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
