"""Evaluator metric tests against hand computations
(reference eval/evaluator.py:11-259)."""
import functools

import numpy as np
import pytest

from advmil_tpu import losses
from advmil_tpu.eval import prepare_evaluator

RNG = np.random.default_rng(13)


@pytest.fixture
def cont_data():
    n = 40
    t = RNG.uniform(0.1, 1.0, size=n).astype(np.float32)
    e = (RNG.uniform(size=n) < 0.6).astype(np.float32)
    y_hat = RNG.uniform(0.05, 0.95, size=(n, 1)).astype(np.float32)
    f_fake = RNG.normal(size=n).astype(np.float32)
    return {"y": np.stack([t, e], axis=1), "y_hat": y_hat, "f_fake": f_fake}


def test_cont_evaluator_metrics(cont_data):
    end_time = 2.0
    ev = prepare_evaluator(
        "continuous", end_time=end_time,
        recon_loss=functools.partial(losses.recon_loss, alpha=0.3, gamma=0.0),
        rank_loss=None,
        disc_loss=functools.partial(losses.real_fake_loss, which="bce"))
    out = ev.compute(cont_data, ["c_index", "loss_recon", "loss_recon_org",
                                 "loss_fake_netD", "loss_fake_netG", "avg_fake",
                                 "event_t_rae", "nonevent_t_rae",
                                 "event_t_nre", "nonevent_t_nre", "mae",
                                 "loss_rank"])
    t = cont_data["y"][:, 0]
    e = cont_data["y"][:, 1]
    yh = cont_data["y_hat"][:, 0]
    ff = cont_data["f_fake"]
    # hand-computed expectations
    np.testing.assert_allclose(out["avg_fake"], ff.mean(), rtol=1e-5)
    np.testing.assert_allclose(out["loss_fake_netG"], -ff.mean(), rtol=1e-5)
    idx = e == 1
    np.testing.assert_allclose(out["event_t_rae"],
                               np.mean(np.abs(t[idx] - yh[idx]) / end_time),
                               rtol=1e-5)
    np.testing.assert_allclose(out["nonevent_t_rae"],
                               np.mean(np.maximum(t[~idx] - yh[~idx], 0) / end_time),
                               rtol=1e-5)
    np.testing.assert_allclose(out["event_t_nre"],
                               np.mean((yh[idx] - t[idx]) / end_time), rtol=1e-4)
    # loss_recon uses alpha=0.3; loss_recon_org forces alpha=0
    assert out["loss_recon"] != out["loss_recon_org"]
    assert out["loss_rank"] == 0.0  # rank_loss=None
    assert 0.0 <= out["c_index"] <= 1.0


def test_cont_evaluator_prefers_avg_y_hat(cont_data):
    ev = prepare_evaluator("continuous", end_time=1.0)
    base = ev.compute(cont_data, ["c_index"])["c_index"]
    flipped = dict(cont_data)
    flipped["avg_y_hat"] = -cont_data["y_hat"]  # reversed ranking
    got = ev.compute(flipped, ["c_index"])["c_index"]
    np.testing.assert_allclose(got, 1.0 - base, atol=0.02)  # ties aside


def test_disc_evaluator():
    n, T = 30, 4
    t = RNG.integers(0, T, size=n).astype(np.float32)
    e = (RNG.uniform(size=n) < 0.6).astype(np.float32)
    hz = RNG.uniform(0.05, 0.95, size=(n, T)).astype(np.float32)
    ff = RNG.normal(size=n).astype(np.float32)
    data = {"y": np.stack([t, e], axis=1), "y_hat": hz, "f_fake": ff}
    ev = prepare_evaluator(
        "discrete", mle_loss=functools.partial(losses.surv_mle_loss, alpha=0.2),
        disc_loss=functools.partial(losses.real_fake_loss, which="bce"))
    out = ev.compute(data, ["c_index", "loss_mle", "loss_mle_org",
                            "loss_fake_netD", "loss_fake_netG", "avg_fake"])
    want = float(losses.surv_mle_loss(hz, t, e, alpha=0.2))
    np.testing.assert_allclose(out["loss_mle"], want, rtol=1e-5)
    want0 = float(losses.surv_mle_loss(hz, t, e, alpha=0.2, cur_alpha=0.0))
    np.testing.assert_allclose(out["loss_mle_org"], want0, rtol=1e-5)
    assert 0.0 <= out["c_index"] <= 1.0


def test_cox_evaluator():
    n = 25
    t = RNG.uniform(1, 100, size=n).astype(np.float32)
    e = np.ones(n, np.float32)
    yh = RNG.normal(size=(n, 1)).astype(np.float32)
    data = {"y": np.stack([t, e], axis=1), "y_hat": yh}
    ev = prepare_evaluator("prohazard", ple_loss=losses.surv_ple_loss)
    out = ev.compute(data, ["c_index", "loss_ple"])
    want = float(losses.surv_ple_loss(yh[:, 0], t, e))
    np.testing.assert_allclose(out["loss_ple"], want, rtol=1e-5)


def test_unknown_metric_rejected(cont_data):
    ev = prepare_evaluator("continuous", end_time=1.0)
    with pytest.raises(AssertionError):
        ev.compute(cont_data, ["nope"])
    with pytest.raises(ValueError):
        prepare_evaluator("bogus")
