"""Plumbing shared by AdvHandler and BaselineHandler (VERDICT r2 #7).

Both handlers mirror the same reference contracts — save/load path layout
(reference model/model_handler.py:52-70 / baseline_handler.py:44-64), the
bucketed batcher, host→device shipping with optional bf16 + mesh sharding,
and the multi-host fetch — so the logic lives once, here, as a mixin.

Mixin contract: the handler sets ``self.cfg`` before calling `_setup_paths`,
and ``self.state`` (a pytree train state) before `_setup_parallel`.
"""
from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..config import scatter_free_from_cfg as _scatter_free_cfg
from ..data.bags import BucketBatcher
from ..utils.func import print_config
from ..utils.logging import RunLogger


class HandlerCommon:
    """Shared path / parallel / logging / batching / transfer plumbing."""

    # -- paths (reference model_handler.py:52-70) --

    def _setup_paths(self):
        cfg = self.cfg
        if cfg["test"]:
            cfg["test_save_path"] = cfg["test_save_path"].format(
                cfg["test_mask_ratio"], cfg["data_split_seed"])
            cfg["test_load_path"] = cfg["test_load_path"].format(
                cfg["data_split_seed"])
            os.makedirs(cfg["test_save_path"], exist_ok=True)
            self.save_dir = cfg["test_save_path"]
            self.load_dir = cfg["test_load_path"]
        else:
            os.makedirs(cfg["save_path"], exist_ok=True)
            self.save_dir = cfg["save_path"]
            self.load_dir = cfg["save_path"]
        self.config_path = osp.join(self.save_dir, "print_config.txt")
        self.metrics_paths = {
            "best": osp.join(self.save_dir, "metrics-best.txt"),
            "last": osp.join(self.save_dir, "metrics-last.txt")}

    # -- device mesh / multi-host (SURVEY.md §2.10, §5) --

    def _setup_parallel(self):
        cfg = self.cfg
        self.mesh = None
        self.mesh_2d = False
        self.multi_host = jax.process_count() > 1
        dp = int(cfg.get("dp_devices", 1) or 1)
        ip = int(cfg.get("inst_devices", 1) or 1)
        if self.multi_host:
            # multi-host DP over every process's devices; DCN/ICI collectives
            # are inserted by XLA. Batches are assembled per process from
            # host-local rows (parallel/dist.py).
            from ..parallel.dist import global_mesh, replicate_global
            if ip > 1:
                print("[parallel] WARNING: inst_devices is ignored in "
                      "multi-host runs (pure data-parallel global mesh)")
            self.mesh = global_mesh()
            self.state = replicate_global(self.state, self.mesh)
            print(f"[parallel] multi-host data-parallel: "
                  f"{jax.process_count()} processes x "
                  f"{jax.local_device_count()} devices")
        elif ip > 1:
            from ..parallel.mesh import make_mesh_2d, replicate_state
            from ..models.layers import set_inst_mesh
            self.mesh = make_mesh_2d(dp, ip)
            self.mesh_2d = True
            self.state = replicate_state(self.state, self.mesh)
            # registered so long-bag attention traces the sequence-parallel
            # flash wrapper instead of forfeiting the kernel (ops/attention
            # .masked_flash_attention_inst; gate: effective_flash_min_len)
            set_inst_mesh(self.mesh)
            print(f"[parallel] data x instance parallel over {dp}x{ip} devices")
        elif dp > 1:
            from ..parallel.mesh import make_mesh, replicate_state
            self.mesh = make_mesh(dp)
            self.state = replicate_state(self.state, self.mesh)
            print(f"[parallel] data-parallel over {dp} devices")

    # -- run logger (reference model_handler.py:40-49) --

    def _setup_logging(self):
        cfg = self.cfg
        self.patient_id = {}
        self.np_rng = np.random.default_rng(cfg["seed"])
        run_name = self.save_dir.rstrip("/").split("/")[-1]
        from ..parallel.dist import is_primary
        self.is_primary = is_primary()
        # test mode logs to its own project when given (reference
        # model_handler.py:47-49 switches wandb projects for exec_test)
        prj = (cfg.get("test_wandb_prj") or cfg.get("wandb_prj")) \
            if cfg.get("test") else cfg.get("wandb_prj")
        self.logger = RunLogger(prj, run_name, self.save_dir,
                                config=cfg, enabled=self.is_primary)
        if self.is_primary:
            print_config(cfg, print_to_path=self.config_path)

    # -- bucketed batching --

    def _make_bucket_batcher(self, ds, for_train: bool = False) -> BucketBatcher:
        multiple = (jax.device_count() if self.multi_host
                    else int(self.cfg.get("dp_devices", 1) or 1))
        b = BucketBatcher(ds,
                          token_budget=self.cfg["batch_token_budget"],
                          max_batch=self.cfg["batch_max_size"],
                          min_bucket=self.cfg["bucket_min"],
                          bucket_growth=float(
                              self.cfg.get("bucket_growth", 2.0) or 2.0),
                          # padded N must stay shardable over the inst axis
                          n_multiple=16 * int(
                              self.cfg.get("inst_devices", 1) or 1),
                          batch_multiple=multiple,
                          edges_per_node=int(self.cfg.get("graph_edges_per_node", 9)),
                          # reverse tables only pay off in the backward pass
                          scatter_free=(_scatter_free_cfg(self.cfg)
                                        if for_train else "off"),
                          banded=self.cfg.get("graph_banded", "auto"),
                          grid_max_inflation=float(
                              self.cfg.get("graph_grid_max_inflation", 3.0)))
        nw = int(self.cfg.get("num_workers", 0) or 0)
        b.prefetch_depth = max(2, nw)
        # num_workers > 1 also engages the thread-pool loader (the
        # reference's DataLoader(num_workers=8) analogue; batch content is
        # order-identical to the serial path)
        b.prefetch_workers = max(1, nw)
        return b

    # -- host -> device shipping --

    def _ship(self, dev: dict) -> dict:
        """Cast/shard a host batch dict onto the device(s): optional bf16
        feats, per-process slicing + global assembly in multi-host runs,
        dp/2-D mesh sharding otherwise."""
        bf16 = self.cfg.get("precision") in ("bf16", "bfloat16")
        if self.multi_host:
            # every process builds the same global batch; ship only the
            # process-local rows, assemble a global sharded array. Slice
            # FIRST, then cast in numpy: casting on device before slicing
            # would round-trip the whole global feats through device 0
            from ..parallel.dist import make_global_batch, process_local_slice
            sl = process_local_slice(len(dev["sample_mask"]))
            local = {k: np.asarray(v)[sl] for k, v in dev.items()}
            if bf16:
                local["feats"] = local["feats"].astype(jnp.bfloat16)
            return make_global_batch(local, self.mesh)
        if bf16:
            dev["feats"] = jnp.asarray(dev["feats"], jnp.bfloat16)
        if self.mesh is not None:
            if self.mesh_2d:
                from ..parallel.mesh import shard_batch_2d
                return shard_batch_2d(dev, self.mesh)
            from ..parallel.mesh import shard_batch
            return shard_batch(dev, self.mesh)
        return {k: jnp.asarray(v) for k, v in dev.items()}

    # -- device -> host fetch --

    def _fetch(self, tree):
        """Host-fetch a pytree of device arrays; in multi-host runs the
        data-sharded leaves are allgathered so every process sees full
        batches (collective call — same order on all processes)."""
        if self.multi_host:
            from ..parallel.dist import gather_to_hosts
            return gather_to_hosts(tree)
        return jax.device_get(tree)
