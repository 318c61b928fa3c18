"""Full CLI integration: run ``main.py --config ... --handler adv/base``
as a subprocess on synthetic data (the user-facing contract,
reference main.py:108-121)."""
import json
import os
import subprocess
import sys

import yaml
import pytest

from advmil_tpu.data.synthetic import make_synthetic_dataset
from tests.test_train_smoke import base_cfg


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthcli")
    return make_synthetic_dataset(str(root), n_patients=24, dim=256,
                                  min_regions=2, max_regions=8, seed=2,
                                  n_folds=2)


def _run_cli(cfg, tmp_path, handler, multi_run=False):
    cfg_path = tmp_path / "cfg.yaml"
    cfg = {k: v for k, v in cfg.items() if v is not None or k == "path_coordx5"}
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ADVMIL_FORCE_CPU"] = "1"
    cmd = [sys.executable, "main.py", "--config", str(cfg_path),
           "--handler", handler]
    if multi_run:
        cmd.append("--multi_run")
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=os.path.dirname(os.path.dirname(__file__)))


def test_cli_adv(synth, tmp_path):
    cfg = base_cfg(synth, tmp_path, epochs=2, times_test_sample=2,
                   bcb_dims="256-32-32", gen_dims="32-1",
                   disc_netx_in_dim=256, disc_netx_out_dim=16,
                   disc_nety_hid_dims="8-16")
    r = _run_cli(cfg, tmp_path, "adv")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "[INFO] Metrics:" in r.stdout


def test_cli_multirun_grid(synth, tmp_path):
    cfg = base_cfg(synth, tmp_path, epochs=2, times_test_sample=2,
                   bcb_dims="256-32-32", gen_dims="32-1",
                   disc_netx_in_dim=256, disc_netx_out_dim=16,
                   disc_nety_hid_dims="8-16")
    cfg["data_split_seed"] = [0, 1]   # 2-fold CV grid
    r = _run_cli(cfg, tmp_path, "adv", multi_run=True)
    assert r.returncode == 0, r.stderr[-3000:]
    assert r.stdout.count("[INFO] Metrics:") == 2
    assert "-data_split_seed_0" in r.stdout and "-data_split_seed_1" in r.stdout


def test_cli_base(synth, tmp_path):
    cfg = base_cfg(synth, tmp_path, epochs=2, times_test_sample=1,
                   gen_noi_noise="0-0",
                   bcb_dims="256-32-32", gen_dims="32-1",
                   disc_netx_in_dim=256, disc_netx_out_dim=16,
                   disc_nety_hid_dims="8-16")
    cfg.update({"task": "surv_cox", "pdh_dims": "32-1", "mlp_hops": 1,
                "mlp_norm": False, "mlp_dropout": 0.25,
                "opt_net": "adam", "opt_net_lr": 0.0008,
                "opt_net_weight_decay": 0.0})
    r = _run_cli(cfg, tmp_path, "base")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "[INFO] Metrics:" in r.stdout
