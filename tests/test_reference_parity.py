"""Direct numerical parity against the ACTUAL reference implementation.

The reference's loss/metric modules are pure torch/numpy and import cleanly
from the read-only mount; we run the same random inputs through the reference
functions and ours and require agreement. This is the ground truth behind the
'C-index within 0.005' target (SURVEY.md §6).
"""
import os.path as osp
import sys

import numpy as np
import pytest

REF = "/root/reference"
if not osp.isdir(REF):  # CI without the reference mount
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, REF)

import importlib

try:
    ref_loss = importlib.import_module("loss.utils")
    ref_cindex = importlib.import_module("eval.cindex")
    ref_func = importlib.import_module("utils.func")
finally:
    # don't leave the reference tree shadowing this repo's top-level modules
    # (its main.py would hijack `import main` in later tests)
    sys.path.remove(REF)

import jax.numpy as jnp

from advmil_tpu import losses
from advmil_tpu.eval.cindex import concordance_index

RNG = np.random.default_rng(42)


def _surv(n, event_frac=0.6):
    t = RNG.uniform(0.05, 1.0, size=n).astype(np.float32)
    e = (RNG.uniform(size=n) < event_frac).astype(np.float32)
    pred = RNG.uniform(0.01, 0.99, size=n).astype(np.float32)
    return pred, t, e


@pytest.mark.parametrize("alpha,gamma,norm", [(0.0, 0.0, "l1"), (0.3, 1.0, "l2"),
                                              (0.7, 2.0, "l1")])
def test_recon_loss_vs_reference(alpha, gamma, norm):
    pred, t, e = _surv(41)
    want = ref_loss.recon_loss(torch.tensor(pred), torch.tensor(t),
                               torch.tensor(e), alpha=alpha, gamma=gamma,
                               norm=norm).item()
    got = float(losses.recon_loss(pred, t, e, alpha=alpha, gamma=gamma, norm=norm))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("add_weight", [False, True])
def test_rank_loss_vs_reference(add_weight):
    pred, t, e = _surv(29)
    want = ref_loss.rank_loss(torch.tensor(pred), torch.tensor(t),
                              torch.tensor(e), gamma=0.2,
                              add_weight=add_weight).item()
    got = float(losses.rank_loss(pred, t, e, gamma=0.2, add_weight=add_weight))
    np.testing.assert_allclose(got, want, rtol=5e-4)


@pytest.mark.parametrize("alpha", [0.0, 0.4])
def test_surv_mle_vs_reference(alpha):
    B, T = 17, 4
    hz = RNG.uniform(0.01, 0.99, size=(B, T)).astype(np.float32)
    t = RNG.integers(0, T, size=B).astype(np.int64)
    e = (RNG.uniform(size=B) < 0.5).astype(np.float32)
    ref = ref_loss.SurvMLE(alpha=alpha)
    want = ref(torch.tensor(hz), torch.tensor(t), torch.tensor(e)).item()
    got = float(losses.surv_mle_loss(hz, t, e, alpha=alpha))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_surv_ple_vs_reference():
    pred, t, e = _surv(23)
    pred = pred * 14  # exercise the clip-at-10 branch
    ref = ref_loss.SurvPLE()
    want = ref(torch.tensor(pred), torch.tensor(t), torch.tensor(e)).item()
    got = float(losses.surv_ple_loss(pred, t, e))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("which", ["bce", "hinge", "wasserstein"])
@pytest.mark.parametrize("with_real", [True, False])
def test_real_fake_loss_vs_reference(which, with_real):
    fake = RNG.normal(size=31).astype(np.float32)
    real = RNG.normal(size=13).astype(np.float32) if with_real else None
    want = ref_loss.real_fake_loss(
        None if real is None else torch.tensor(real), torch.tensor(fake),
        which=which).item()
    got = float(losses.real_fake_loss(real, fake, which=which))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_mse_loss_vs_reference():
    pred, t, e = _surv(19)
    for inc in [False, True]:
        want = ref_loss.MSE_loss(torch.tensor(pred), torch.tensor(t),
                                 torch.tensor(e), include_censored=inc).item()
        got = float(losses.mse_loss(pred, t, e, include_censored=inc))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_get_label_mask_vs_reference():
    t = torch.tensor([[0.0], [2.0], [3.0]])
    e = torch.tensor([[1.0], [0.0], [1.0]])
    c = 1 - e
    want_label, want_mask = ref_func.get_label_mask(t, c, 4)
    got_label, got_mask = losses.get_label_mask(np.array([0, 2, 3]),
                                                np.array([1.0, 0.0, 1.0]), 4)
    np.testing.assert_array_equal(np.asarray(got_label), want_label.numpy())
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  want_mask.numpy().astype(np.float32))


@pytest.mark.parametrize("n,tie_frac,cols", [(60, 0.0, 1), (100, 0.4, 1),
                                             (80, 0.2, 4)])
def test_cindex_vs_reference(n, tie_frac, cols):
    time = RNG.uniform(1, 100, size=n)
    if tie_frac:
        idx = RNG.choice(n, int(n * tie_frac), replace=False)
        time[idx] = np.round(time[idx] / 10) * 10
    event = (RNG.uniform(size=n) < 0.6)
    event[:2] = True
    y_true = np.stack([time, event.astype(float)], axis=1)
    if cols == 1:
        y_pred = RNG.normal(size=(n, 1))
        y_pred[: n // 4] = np.round(y_pred[: n // 4], 1)  # tied risks
    else:
        y_pred = RNG.uniform(0.01, 0.99, size=(n, cols))
    want = ref_cindex.concordance_index(y_true.copy(), y_pred.copy())
    got = concordance_index(y_true, y_pred)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_early_stopping_vs_reference():
    if not hasattr(ref_func.np, "Inf"):  # np.Inf removed in numpy 2
        ref_func.np.Inf = np.inf
    ours_cls = __import__("advmil_tpu.utils.func", fromlist=["EarlyStopping"]).EarlyStopping
    seq = RNG.uniform(0.2, 1.0, size=60).tolist()
    ref = ref_func.EarlyStopping(warmup=3, patience=5, start_epoch=2)
    ours = ours_cls(warmup=3, patience=5, start_epoch=2)
    for ep, v in enumerate(seq):
        ref(ep, v)
        ours(ep, v)
        assert ref.if_save_checkpoint() == ours.if_save_checkpoint(), ep
        assert ref.if_stop() == ours.if_stop(), ep
        if ref.if_stop():
            break


def test_disc_task_label_mask_matches_reference_handler():
    """The reference HANDLER passes the event indicator into get_label_mask's
    censorship arg (model_handler.py:382), flipping the documented semantics;
    the train step must reproduce that exact behavior."""
    t = torch.tensor([[0.0], [2.0], [3.0]])
    e = torch.tensor([[1.0], [0.0], [1.0]])
    want_label, want_mask = ref_func.get_label_mask(t, e, 4)  # handler call
    got_label, got_mask = losses.get_label_mask(
        np.array([0, 2, 3]), 1.0 - np.array([1.0, 0.0, 1.0]), 4)  # steps.py call
    np.testing.assert_array_equal(np.asarray(got_label), want_label.numpy())
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  want_mask.numpy().astype(np.float32))
