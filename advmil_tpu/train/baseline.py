"""Baseline (non-adversarial) handler: SurvNet + one supervised optimizer.

Parity with the reference BaselineHandler (reference
model/baseline_handler.py:26-521): task surv_nll / surv_cox / surv_reg infers
time_format + out-scale + loss; Cox baselines use the pytorch-0.4.1-style
uniform init, sigmoid baselines use xavier (reference
model/baseline_handler.py:84-87).
"""
from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import effective_flash_min_len
from ..data.bags import prepare_dataset, BucketBatcher
from ..eval import prepare_evaluator
from ..models.backbones import load_backbone
from ..models.gan import SurvNet
from ..models.layers import DenseInit
from ..utils.func import (sparse_str, EarlyStopping, add_prefix_to_filename,
                          print_metrics, rename_keys,
                          seed_everything)
from ..utils.io import (read_datasplit_npz, read_maxt_from_table,
                        save_prediction)
from . import checkpoint as ckpt_lib
from .common import HandlerCommon
from .optim import (create_optimizer, ReduceLROnPlateau,
                    reset_multisteps_accum)
from .steps import (BaseTrainState, make_base_train_step, make_eval_step,
                    make_supervised_loss)


class BaselineHandler(HandlerCommon):
    def __init__(self, cfg: dict):
        assert cfg["task"] in ["surv_cox", "surv_nll", "surv_reg"]
        assert cfg["bcb_mode"] in ["patch", "cluster", "graph", "abmil"]
        seed_everything(cfg["seed"])
        self.cfg = cfg
        from ..config import apply_rng_impl, enable_compilation_cache
        enable_compilation_cache(cfg)
        apply_rng_impl(cfg)  # before any jax.random key is created
        self.task = cfg["task"]
        self.bcb = cfg["bcb_mode"]
        self.nbins = cfg.get("time_bins", 4)
        self._setup_paths()

        # infer out_scale / time_format from task (reference
        # model/baseline_handler.py:66-76)
        if self.task == "surv_nll":
            out_scale, cfg["time_format"] = "sigmoid", "quantile"
        elif self.task == "surv_reg":
            out_scale, cfg["time_format"] = "sigmoid", "ratio"
        else:
            out_scale, cfg["time_format"] = "none", "origin"

        from ..models.layers import set_compute_dtype
        set_compute_dtype(cfg.get("precision", "f32"))
        dense_init = (DenseInit.XAVIER if out_scale == "sigmoid"
                      else DenseInit.PT041)
        backbone_dims = sparse_str(cfg["bcb_dims"])
        backbone = load_backbone(self.bcb, backbone_dims, dense_init=dense_init,
                                 use_pallas=cfg.get("use_pallas", True),
                                 num_graph_layers=cfg.get("num_graph_layers", 1),
                                 grid_resident=cfg.get(
                                     "graph_grid_resident", False),
                                 use_fused_embed=cfg.get("use_fused_embedding", False),
                                 use_lnpool=cfg.get("use_fused_lnpool", True),
                                 tra_backbone=cfg.get("tra_backbone", "Transformer"),
                                 flash_min_len=effective_flash_min_len(cfg))
        dim_in, dim_out = sparse_str(cfg["pdh_dims"])
        self.model = SurvNet(backbone=backbone, dim_in=dim_in, dim_out=dim_out,
                             hops=cfg.get("mlp_hops", 1),
                             norm=cfg.get("mlp_norm", False),
                             dropout=cfg.get("mlp_dropout", 0.25),
                             out_scale=out_scale, dense_init=dense_init)
        self.feat_dim = backbone_dims[0]

        root = jax.random.PRNGKey(cfg["seed"])
        k1, kstep = jax.random.split(root)
        dummy_n = 16
        feats = jnp.zeros((1, dummy_n, backbone_dims[0]), jnp.float32)
        mask = jnp.ones((1, dummy_n), jnp.float32)
        if self.bcb == "cluster":
            extra = jnp.zeros((1, dummy_n), jnp.int32)
        elif self.bcb == "graph":
            epn = int(cfg.get("graph_edges_per_node", 9))
            extra = {"edge_src": jnp.zeros((1, dummy_n, epn), jnp.int32),
                     "edge_mask": jnp.ones((1, dummy_n, epn), jnp.float32)}
        else:
            extra = None
        self.params = self.model.init({"params": k1, "dropout": k1},
                                      feats, mask, extra,
                                      deterministic=True)["params"]

        # loss (MSE for ESAT-patch surv_reg, reference
        # model/baseline_handler.py:96-101)
        if self.task == "surv_reg" and self.bcb == "patch":
            self.sup_loss_fn = make_supervised_loss("surv_mse", cfg)
        else:
            self.sup_loss_fn = make_supervised_loss(self.task, cfg)
        self.l1_coef = cfg.get("loss_regl1_coef", 0.0) or 0.0

        self.base_lr = cfg["opt_net_lr"]
        self.second_order = cfg["opt_net"].lower() == "adahessian"
        # optional gradient accumulation, mirroring AdvHandler: MultiSteps
        # INSIDE inject_hyperparams so plateau LR stays addressable
        accum = int(cfg.get("accum_steps", 1) or 1)
        # reference parity option: drop the trailing partial accumulator at
        # epoch end like the reference drops its trailing < bp_every_batch
        # bags (see reset_multisteps_accum)
        self._accum_drop_remainder = (
            accum > 1 and bool(cfg.get("accum_drop_remainder", False)))
        if self.second_order:
            assert accum == 1, "accum_steps is not supported with adahessian"
            from .optim import adahessian
            import jax.tree_util as jtu
            mask = jtu.tree_map(lambda p: p.ndim > 1, self.params)
            self.tx = adahessian(self.base_lr,
                                 weight_decay=cfg["opt_net_weight_decay"] or 0.0,
                                 params_mask=mask)
        else:
            def make_tx(learning_rate):
                tx = create_optimizer(cfg["opt_net"], learning_rate,
                                      weight_decay=cfg["opt_net_weight_decay"],
                                      params=self.params,
                                      flatten=cfg.get("opt_flatten", True))
                return optax.MultiSteps(tx, accum) if accum > 1 else tx

            self.tx = optax.inject_hyperparams(make_tx)(
                learning_rate=self.base_lr)
        self.state = BaseTrainState(params=self.params,
                                    opt=self.tx.init(self.params), rng=kstep)
        self.train_step = make_base_train_step(
            self.model, self.tx, task=self.task, bcb_mode=self.bcb,
            l1_coef=self.l1_coef, sup_loss_fn=self.sup_loss_fn, donate=False,
            second_order=self.second_order)
        self._eval_steps = {}

        end_time = (read_maxt_from_table(cfg["path_label"])
                    if cfg["time_format"] in ["origin", "quantile"] else 1.0)
        if self.task == "surv_reg":
            self.evaluator = prepare_evaluator("continuous", end_time=end_time,
                                               recon_loss=self.sup_loss_fn)
            self.metrics_list = ["c_index", "loss_recon", "mae", "event_t_rae",
                                 "nonevent_t_rae", "event_t_nre", "nonevent_t_nre"]
            self.ret_metrics = ["c_index", "loss_recon"]
        elif self.task == "surv_nll":
            self.evaluator = prepare_evaluator("discrete",
                                               mle_loss=self.sup_loss_fn)
            self.metrics_list = ["c_index", "loss_mle", "loss_mle_org"]
            self.ret_metrics = ["c_index", "loss_mle_org"]
        else:
            self.evaluator = prepare_evaluator("prohazard",
                                               ple_loss=self.sup_loss_fn)
            self.metrics_list = ["c_index", "loss_ple"]
            self.ret_metrics = ["c_index", "loss_ple"]

        # ---- data / instance / multi-host parallelism + logging (shared
        # plumbing: train/common.py HandlerCommon) ----
        self._setup_parallel()
        self._setup_logging()

    def _ckpt_path(self, ckpt_type, run_name, load=False):
        base = self.load_dir if load else self.save_dir
        return osp.join(base, f"{run_name}_model-{ckpt_type}.ckpt")

    def _batcher(self, ds, for_train: bool = False):
        b = self._make_bucket_batcher(ds, for_train)
        if self.task == "surv_cox":
            # Cox partial likelihood builds risk sets WITHIN a batch; a
            # single-bag batch contributes exactly zero loss/gradient
            degenerate = [n for n in b.buckets if b.batch_size_for(n) < 2]
            if degenerate:
                print(f"[surv_cox] WARNING: buckets {degenerate} get batch "
                      "size 1 -> zero PLE gradient for those bags; raise "
                      "batch_token_budget. Note risk sets are bucket-local "
                      "(the reference uses 16 random bags per step).")
        return b

    def _to_device(self, batch):
        dev = {"feats": np.asarray(batch.feats),
               "mask": batch.mask, "label": batch.label,
               "sample_mask": batch.sample_mask,
               "visible": batch.sample_mask}
        dev.update(batch.extra)
        return self._ship(dev)

    # -- exec / exec_test --

    def exec(self):
        cfg = self.cfg
        print(f"[exec] execute task {self.task} using backbone-mode {self.bcb}.")
        path_split = cfg["data_split_path"].format(cfg["data_split_seed"])
        pids_train, pids_val, pids_test = read_datasplit_npz(path_split)
        train_set = prepare_dataset(pids_train, cfg,
                                    ratio_sampling=cfg["train_sampling"],
                                    rng=self.np_rng)
        val_set = prepare_dataset(pids_val, cfg, rng=self.np_rng)
        self.patient_id["train"] = train_set.pids
        self.patient_id["validation"] = val_set.pids
        loaders = {"train": (train_set, self._batcher(train_set, for_train=True)),
                   "validation": (val_set, self._batcher(val_set))}
        if pids_test is not None:
            test_set = prepare_dataset(pids_test, cfg, rng=self.np_rng)
            self.patient_id["test"] = test_set.pids
            loaders["test"] = (test_set, self._batcher(test_set))
        val_loaders = {k: v for k, v in loaders.items() if k != "train"}
        self._run_training(cfg["epochs"], loaders["train"], "train",
                           val_loaders=val_loaders, val_name="validation",
                           early_stop=True, run_name="train")
        return self._eval_all(loaders, ckpt_type="best", run_name="train")

    def exec_test(self):
        cfg = self.cfg
        path_split = cfg["data_split_path"].format(cfg["data_split_seed"])
        pids_train, pids_val, pids_test = read_datasplit_npz(path_split)
        pids = {"train": pids_train, "val": pids_val,
                "test": pids_test}[cfg["test_path"]]
        test_set = prepare_dataset(pids, cfg, mask_ratio=cfg["test_mask_ratio"],
                                   rng=self.np_rng)
        self.patient_id["exec-test"] = test_set.pids
        loaders = {"exec-test": (test_set, self._batcher(test_set))}
        return self._eval_all(loaders, ckpt_type="best", run_name="train",
                              test_mode=True)

    # -- training loop --

    def _run_training(self, epochs, train_loader, name_loader, val_loaders=None,
                      val_name=None, early_stop=False, run_name="train"):
        cfg = self.cfg
        if early_stop and cfg.get("es_patience") is not None:
            self.early_stop = EarlyStopping(
                warmup=cfg["es_warmup"], patience=cfg["es_patience"],
                start_epoch=cfg["es_start_epoch"], verbose=cfg["es_verbose"])
        else:
            self.early_stop = None
        self.steplr = ReduceLROnPlateau(factor=0.5, patience=10)
        last_epoch = -1
        for epoch in range(epochs):
            last_epoch = epoch + 1
            cltor = self._train_each_epoch(train_loader)
            self._eval_and_print(cltor, name=name_loader, at_epoch=epoch + 1)
            val_metrics = None
            if val_loaders is not None:
                for k, (ds, batcher) in val_loaders.items():
                    c = self._run_eval(ds, batcher, n_samples=1)
                    ci, lo = self._eval_and_print(c, name=k, at_epoch=epoch + 1)
                    if k == val_name:
                        # 'ci' = reference's inverted semantics; 'ci_max' =
                        # corrected opt-in (negated for min-tracking)
                        mm = cfg.get("monitor_metrics", "loss")
                        val_metrics = (ci if mm == "ci"
                                       else -ci if mm == "ci_max" else lo)
            if val_metrics is not None and self.early_stop is not None:
                scale = self.steplr.step(val_metrics)
                self._set_lr(self.base_lr * scale)
                self.early_stop(epoch, val_metrics)
                if self.early_stop.if_save_checkpoint():
                    self.save_model(epoch + 1, "best", run_name)
                if self.early_stop.if_stop():
                    break
        self.save_model(last_epoch, "last", run_name)

    def _set_lr(self, lr):
        opt = self.state.opt
        try:
            hp = dict(opt.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            self.state = self.state.replace(opt=opt._replace(hyperparams=hp))
        except AttributeError:
            if not getattr(self, "_warned_no_lr_injection", False):
                self._warned_no_lr_injection = True
                print("[lr] WARNING: optimizer state has no injected "
                      "learning_rate (adahessian bakes LR into the transform); "
                      "ReduceLROnPlateau has no effect")

    def _train_each_epoch(self, loader):
        ds, batcher = loader
        cltor = {"y": [], "y_hat": [], "idx": []}
        pending_metrics, pending_preds, keeps = [], [], []
        for batch in batcher.prefetch(shuffle=True, rng=self.np_rng):
            dev = self._to_device(batch)
            self.state, metrics, collect = self.train_step(self.state, dev)
            pending_metrics.append(metrics)
            keep = batch.sample_mask.astype(bool)
            cltor["y"].append(batch.label[keep])
            pending_preds.append(collect["y_hat"])
            keeps.append(keep)
            cltor["idx"].append(batch.idx[keep])
        pending_metrics, pending_preds = self._fetch(
            (pending_metrics, pending_preds))
        for metrics in pending_metrics:
            self.logger.log({f"train_batch/net/{k}": float(v)
                             for k, v in metrics.items()})
        cltor["y_hat"] = [np.asarray(v)[keep]
                          for v, keep in zip(pending_preds, keeps)]
        if self._accum_drop_remainder:
            self.state = self.state.replace(
                opt=reset_multisteps_accum(self.state.opt))
        return {k: np.concatenate(v, axis=0) for k, v in cltor.items()}

    # -- evaluation --

    def _get_eval_step(self, n_samples):
        if n_samples not in self._eval_steps:
            self._eval_steps[n_samples] = make_eval_step(
                self.model, None, bcb_mode=self.bcb, n_samples=n_samples,
                zero_noise=True)
        return self._eval_steps[n_samples]

    def _run_eval(self, ds, batcher, n_samples=1, params=None):
        params = self.state.params if params is None else params
        step = self._get_eval_step(n_samples)
        rng = jax.random.PRNGKey(self.cfg["seed"] + 777)
        cltor = {"y": [], "y_hat": [], "idx": []}
        if n_samples > 1:
            cltor["avg_y_hat"] = []
            cltor["dist_y_hat"] = []
        pending, keeps = [], []
        for batch in batcher.prefetch(shuffle=False):
            rng, sub = jax.random.split(rng)
            out = step(params, None, self._to_device(batch), sub)
            keep = batch.sample_mask.astype(bool)
            cltor["y"].append(batch.label[keep])
            cltor["idx"].append(batch.idx[keep])
            pending.append(out)
            keeps.append(keep)
        pending = self._fetch(pending)
        for out, keep in zip(pending, keeps):
            cltor["y_hat"].append(np.asarray(out["y_hat"])[keep])
            if n_samples > 1:
                cltor["avg_y_hat"].append(np.asarray(out["avg_y_hat"])[keep])
                cltor["dist_y_hat"].append(np.asarray(out["dist_y_hat"])[keep])
        return {k: np.concatenate(v, axis=0) for k, v in cltor.items()}

    def _eval_and_print(self, cltor, name="", at_epoch=None):
        results = self.evaluator.compute(cltor, self.metrics_list)
        results = rename_keys(results, name, sep="/")
        print(f"[{name}] At epoch {at_epoch}:",
              " ".join(f"{k}={v:.6f}," for k, v in results.items()))
        self.logger.log(results)
        return [results[name + "/" + k] for k in self.ret_metrics]

    def _eval_all(self, evals_loader, ckpt_type="best", run_name="train",
                  test_mode=False, test_mode_name="test_mode"):
        cfg = self.cfg
        group = test_mode_name if test_mode else run_name
        sampling = cfg["test_sampling_times"] if test_mode else 1
        ckpt = self._ckpt_path(ckpt_type, "train" if test_mode else run_name,
                               load=test_mode)
        if not osp.exists(ckpt):
            raise FileNotFoundError(
                f"checkpoint {ckpt} not found (no '{ckpt_type}' model was "
                "saved — check es_warmup/epochs or test_load_path)")
        _, params, _ = ckpt_lib.restore_checkpoint(
            ckpt, self.state.params,
            backend=self.cfg.get("ckpt_backend", "msgpack"))
        if self.multi_host:
            from ..parallel.dist import replicate_global
            params = replicate_global(params, self.mesh)
        wandb_group = f"{'bestckpt' if ckpt_type == 'best' else 'lastckpt'}/{group}"
        print_path = add_prefix_to_filename(self.metrics_paths[ckpt_type], group)
        metrics = {}
        for k, (ds, batcher) in evals_loader.items():
            cltor = self._run_eval(ds, batcher, n_samples=sampling, params=params)
            ci, loss = self._eval_and_print(cltor, name=f"{wandb_group}/{k}")
            metrics[k] = [("cindex", ci), ("loss", loss)]
            if cfg["save_prediction"] and self.is_primary:
                y_hat = cltor.get("avg_y_hat", cltor["y_hat"])
                path = osp.join(self.save_dir, f"{group}_{ckpt_type}_pred_{k}.csv")
                pids = [ds.pids[int(i)] for i in cltor["idx"]]
                save_prediction(pids, cltor["y"], y_hat,
                                cltor.get("dist_y_hat"), path)
        if self.is_primary:
            print_metrics(metrics, print_to_path=print_path)
        return metrics

    def save_model(self, epoch, ckpt_type="best", run_name="train"):
        from ..parallel.dist import barrier, is_primary
        if is_primary():
            ckpt_lib.save_checkpoint(self._ckpt_path(ckpt_type, run_name), epoch,
                                     self.state.params, self.state.opt,
                                     backend=self.cfg.get("ckpt_backend",
                                                          "msgpack"))
        barrier("save_model")

    def resume_model(self, ckpt_type="best", run_name="train"):
        e, p, o = ckpt_lib.restore_checkpoint(
            self._ckpt_path(ckpt_type, run_name), self.state.params,
            self.state.opt, backend=self.cfg.get("ckpt_backend", "msgpack"))
        self.state = self.state.replace(params=p, opt=o)
        print(f"[model] resumed from {ckpt_type}_{run_name} at epoch {e}")
