"""Reproducibility: two runs with the same seed produce identical metrics and
predictions (the TPU analogue of reference utils/func.py:166-196 seeding)."""
import numpy as np
import pytest

from advmil_tpu.data.synthetic import make_synthetic_dataset
from tests.test_train_smoke import base_cfg


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdet")
    return make_synthetic_dataset(str(root), n_patients=30, dim=128,
                                  min_regions=2, max_regions=6, seed=8,
                                  event_frac=0.85)


def _run(synth, tmp_path, tag):
    from advmil_tpu.train.handler import AdvHandler
    cfg = base_cfg(synth, tmp_path, epochs=2, times_test_sample=3,
                   bcb_dims="128-16-16", gen_dims="16-1",
                   disc_netx_in_dim=128, disc_netx_out_dim=8,
                   disc_nety_hid_dims="4-8",
                   save_path=str(tmp_path / f"run{tag}"))
    handler = AdvHandler(cfg)
    metrics = handler.exec()
    import pandas as pd
    pred = pd.read_csv(tmp_path / f"run{tag}" / "train_best_pred_test.csv")
    return metrics, pred


def test_same_seed_same_results(synth, tmp_path):
    m1, p1 = _run(synth, tmp_path, "a")
    m2, p2 = _run(synth, tmp_path, "b")
    assert dict(m1["test"])["cindex"] == dict(m2["test"])["cindex"]
    np.testing.assert_array_equal(p1["pred_t"].values, p2["pred_t"].values)
    assert list(p1["patient_id"]) == list(p2["patient_id"])
