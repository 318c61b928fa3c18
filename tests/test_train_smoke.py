"""End-to-end smoke runs on synthetic data: the 'minimum end-to-end slice' of
SURVEY.md §7 step 3 (ABMIL + adversarial cont_gansurv) plus the other modes.
Verifies: training runs, losses are finite, checkpoints + metrics + prediction
CSVs are produced, and learning moves train C-index above chance."""
import glob
import os.path as osp

import numpy as np
import pytest

from advmil_tpu.config import with_defaults
from advmil_tpu.data.synthetic import make_synthetic_dataset


def base_cfg(paths, tmp_path, **over):
    cfg = {
        "task": "cont_gansurv",
        "seed": 42,
        "save_path": str(tmp_path / "run"),
        "dataset": "synthetic",
        "path_patch": paths["path_patch"],
        "path_graph": paths["path_graph"],
        "path_cluster": paths["path_cluster"],
        "path_coordx5": None,
        "path_label": paths["path_label"],
        "feat_format": "npy",
        "time_format": "ratio",
        "time_bins": 4,
        "data_split_path": paths["data_split_path"],
        "data_split_seed": 0,
        "bcb_mode": "abmil",
        "bcb_dims": "1024-64-64",
        "gen_dims": "64-1",
        "gen_noi_noise": "0-1",
        "gen_noi_noise_dist": "uniform",
        "gen_noi_hops": 1,
        "gen_norm": False,
        "gen_dropout": 0.6,
        "gen_out_scale": "sigmoid",
        "disc_type": "prj",
        "disc_netx_in_dim": 1024,
        "disc_netx_out_dim": 32,
        "disc_netx_ksize": 1,
        "disc_netx_backbone": "avgpool",
        "disc_netx_dropout": 0.25,
        "disc_nety_in_dim": 1,
        "disc_nety_hid_dims": "16-32",
        "disc_nety_norm": False,
        "disc_nety_dropout": 0.0,
        "disc_prj_path": "x",
        "disc_prj_iprd": "instance",
        "loss_gan_coef": 0.004,
        "loss_netD": "bce",
        "loss_regl1_coef": 0.00001,
        "loss_mle_alpha": 0.0,
        "loss_recon_norm": "l1",
        "loss_recon_alpha": 0.0,
        "loss_recon_gamma": 0.0,
        "opt_netG": "adam",
        "opt_netG_lr": 0.0008,
        "opt_netG_weight_decay": 0.0005,
        "opt_netD_lr": 0.0008,
        "epochs": 3,
        "batch_size": 1,
        "bp_every_batch": 16,
        "es_patience": 30,
        "es_warmup": 1,
        "es_verbose": False,
        "es_start_epoch": 0,
        "gen_updates": 1,
        "monitor_metrics": "loss",
        "times_test_sample": 4,
        "semi_training": False,
        "semi_training_mode": "none",
        "ssl_epochs": 2,
        "ssl_num_labeled": 0.6,
        "ssl_kfold": 2,
        "ssl_resume_ckpt": "best",
        "ssl_es_patience": 5,
        "ssl_es_warmup": 0,
        "ssl_es_verbose": False,
        "ssl_es_start_epoch": 0,
        "test": False,
        "test_wandb_prj": None,
        "test_path": "test",
        "test_load_path": str(tmp_path / "run"),
        "test_save_path": str(tmp_path / "test-{}-{}"),
        "test_mask_ratio": 0.5,
        "test_sampling_times": 1,
        "test_zero_noise": True,
        "batch_token_budget": 4096,
        "bucket_min": 256,
    }
    cfg.update(over)
    return with_defaults(cfg)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_dataset(str(root), n_patients=30, dim=1024,
                                  min_regions=4, max_regions=24, seed=1)


def test_adv_abmil_cont(synth, tmp_path):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=8)
    handler = AdvHandler(cfg)
    metrics = handler.exec()
    assert "test" in metrics
    ci = dict(metrics["train"])["cindex"]
    assert np.isfinite(ci)
    assert ci > 0.55, f"train c-index should beat chance, got {ci}"
    # artifacts: checkpoints, metrics txt, prediction csv + dist npz
    assert osp.exists(osp.join(cfg["save_path"], "train_modelG-best.ckpt"))
    assert osp.exists(osp.join(cfg["save_path"], "train_modelD-last.ckpt"))
    assert glob.glob(osp.join(cfg["save_path"], "train_metrics-best.txt"))
    assert glob.glob(osp.join(cfg["save_path"], "*_pred_test.csv"))
    assert glob.glob(osp.join(cfg["save_path"], "*_pred_test_dist.npz"))


def test_adv_disc_task(synth, tmp_path):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, task="disc_gansurv", time_format="quantile",
                   gen_dims="64-4", disc_nety_in_dim=4, epochs=2,
                   disc_prj_iprd="bag")
    handler = AdvHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["validation"])["cindex"])


def test_adv_semi_supervised(synth, tmp_path):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, semi_training=True,
                   semi_training_mode="UD+LD", ssl_epochs=3, ssl_kfold=2)
    handler = AdvHandler(cfg)
    metrics = handler.exec_semi_sl()
    assert "validation" in metrics


def test_adv_test_mode(synth, tmp_path):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=2, times_test_sample=4)
    AdvHandler(cfg).exec()  # produce checkpoints
    cfg2 = base_cfg(synth, tmp_path, test=True, times_test_sample=4)
    handler = AdvHandler(cfg2)
    metrics = handler.exec_test()
    assert "exec-test" in metrics
    # test_path selects which split is evaluated (reference
    # model_handler.py:196-204 allows train/val/test)
    for split in ("train", "val"):
        cfg3 = base_cfg(synth, tmp_path, test=True, times_test_sample=2,
                        test_path=split)
        m = AdvHandler(cfg3).exec_test()
        assert "exec-test" in m


def test_adv_semi_supervised_ud_only(synth, tmp_path):
    # UD mode: unlabeled data only in phase 2 (reference
    # model_handler.py:757-768); completes the UD / LD / UD+LD matrix
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, semi_training=True,
                   semi_training_mode="UD", ssl_epochs=2)
    metrics = AdvHandler(cfg).exec_semi_sl()
    assert "validation" in metrics


def test_plateau_lr_survives_grad_accum(synth, tmp_path):
    # VERDICT r1 weak #3: MultiSteps must compose INSIDE inject_hyperparams
    # so ReduceLROnPlateau keeps working with accum_steps > 1 (the reference
    # always has plateau LR active, model/model_handler.py:109,289).
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=2, es_warmup=0, accum_steps=2)
    handler = AdvHandler(cfg)
    lr0 = float(handler.state.opt_G.hyperparams["learning_rate"])
    assert lr0 == pytest.approx(cfg["opt_netG_lr"], rel=1e-6)
    handler._set_lr(lr0 * 0.5)
    assert float(handler.state.opt_G.hyperparams["learning_rate"]) == \
        pytest.approx(lr0 * 0.5, rel=1e-6)
    # the step must still run (and accumulate) with the injected+MultiSteps state
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["train"])["cindex"])


def test_monitor_ci_max_tracks_maximum_cindex(synth, tmp_path):
    # `monitor_metrics: ci_max` is the corrected opt-in (COVERAGE.md quirks):
    # the monitored value is -c_index, so min-tracking EarlyStopping keeps
    # the checkpoint with the MAXIMUM validation c-index — unlike the
    # reference's inverted 'ci' (which keeps the minimum)
    import json
    import glob
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=3, es_warmup=0,
                   monitor_metrics="ci_max")
    handler = AdvHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["validation"])["cindex"])
    scalars = glob.glob(str(tmp_path / "run" / "*_scalars.jsonl"))[0]
    cis = [r["validation/c_index"] for r in map(json.loads, open(scalars))
           if "validation/c_index" in r]
    assert len(cis) >= 3
    assert handler.early_stop.val_loss_min == pytest.approx(-max(cis), abs=1e-9)


def test_baseline_grad_accum_refregime(synth, tmp_path):
    # BaselineHandler accumulation (used by the parity harness's _refregime
    # arm to emulate the reference's batch_size=1 + bp_every_batch=16 regime,
    # reference model/baseline_handler.py:328-368): plateau LR injection must
    # survive MultiSteps and training must run with one bag per microbatch
    from advmil_tpu.train.baseline import BaselineHandler
    from tests.test_handlers_modes import baseline_cfg
    cfg = baseline_cfg(synth, tmp_path, epochs=2, accum_steps=4,
                       batch_max_size=1, accum_drop_remainder=True)
    handler = BaselineHandler(cfg)
    assert handler._accum_drop_remainder
    lr0 = float(handler.state.opt.hyperparams["learning_rate"])
    assert lr0 == pytest.approx(cfg["opt_net_lr"], rel=1e-6)
    handler._set_lr(lr0 * 0.5)
    assert float(handler.state.opt.hyperparams["learning_rate"]) == \
        pytest.approx(lr0 * 0.5, rel=1e-6)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["validation"])["cindex"])


def test_adv_semi_supervised_with_pretrain_phase(synth, tmp_path):
    # the optional supervised first phase (reference exec_semi_sl has it
    # built but skipped by default — model_handler.py:723); ssl_first_phase
    # turns it on here. The reference then evaluates the phase on its LAST
    # checkpoint and writes 'pretrain'-named metrics/prediction artifacts
    # (model_handler.py:730-733) — assert those exist and parse.
    from advmil_tpu.train.handler import AdvHandler
    from advmil_tpu.utils.func import add_prefix_to_filename
    cfg = base_cfg(synth, tmp_path, semi_training=True,
                   semi_training_mode="LD", ssl_epochs=2, ssl_first_phase=True,
                   epochs=2)
    handler = AdvHandler(cfg)
    metrics = handler.exec_semi_sl()
    assert "validation" in metrics
    pre_path = add_prefix_to_filename(handler.metrics_paths["last"],
                                      "pretrain")
    assert osp.exists(pre_path), pre_path
    text = open(pre_path).read()
    for split in ("labeled_train", "unlabeled_train", "validation", "test"):
        assert split in text, f"pretrain metrics missing split {split}"
    # prediction CSVs for the pretrain eval (save_prediction path)
    import pandas as pd
    pred = osp.join(handler.save_dir, "pretrain_last_pred_validation.csv")
    assert osp.exists(pred), pred
    assert len(pd.read_csv(pred)) > 0


def test_model_stats_surface():
    # params + compiled-FLOPs profiling (reference model_stats.py:142-180
    # analogue via XLA cost analysis)
    from advmil_tpu.stats import backbone_stats
    s = backbone_stats("abmil", [64, 32, 32], 64)
    assert s["params"] > 0
    assert np.isfinite(s["flops_forward"]) and s["flops_forward"] > 0
