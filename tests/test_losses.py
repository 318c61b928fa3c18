"""Golden-value tests for every loss against independent numpy oracles
implementing the formulas at reference loss/utils.py:6-208 and
utils/func.py:59-64."""
import numpy as np
import jax.numpy as jnp
import pytest

from advmil_tpu import losses


RNG = np.random.default_rng(0)


def _rand_surv(n, event_frac=0.6):
    t = RNG.uniform(0.05, 1.0, size=n).astype(np.float32)
    e = (RNG.uniform(size=n) < event_frac).astype(np.float32)
    pred = RNG.uniform(0.0, 1.0, size=n).astype(np.float32)
    return pred, t, e


# -------------------------- recon_loss --------------------------

def _recon_oracle(pred, t, e, alpha=0.0, gamma=1.0, norm="l1", cur_alpha=None):
    obs = e * np.abs(pred - t)
    cen = (1 - e) * np.maximum(gamma - (pred - t), 0.0)
    if norm == "l2":
        obs, cen = obs * obs, cen * cen
    a = alpha if cur_alpha is None else cur_alpha
    return np.mean((1 - a) * (obs + cen) + a * obs)


@pytest.mark.parametrize("norm", ["l1", "l2"])
@pytest.mark.parametrize("alpha,gamma", [(0.0, 0.0), (0.3, 1.0), (1.0, 2.0)])
def test_recon_loss(norm, alpha, gamma):
    pred, t, e = _rand_surv(37)
    got = losses.recon_loss(pred, t, e, alpha=alpha, gamma=gamma, norm=norm)
    want = _recon_oracle(pred, t, e, alpha=alpha, gamma=gamma, norm=norm)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_recon_loss_cur_alpha_overrides():
    pred, t, e = _rand_surv(16)
    got = losses.recon_loss(pred, t, e, alpha=0.7, cur_alpha=0.0, gamma=0.5)
    want = _recon_oracle(pred, t, e, alpha=0.7, cur_alpha=0.0, gamma=0.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_recon_loss_weighted_equals_subset():
    """Weighted mean over a 0/1 mask == plain mean over the kept subset —
    the padding-invariance contract of the batched pipeline."""
    pred, t, e = _rand_surv(24)
    w = (RNG.uniform(size=24) < 0.5).astype(np.float32)
    keep = w.astype(bool)
    got = losses.recon_loss(pred, t, e, gamma=1.0, weight=w)
    want = _recon_oracle(pred[keep], t[keep], e[keep], gamma=1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# -------------------------- rank_loss --------------------------

def _rank_oracle(pred, t, e, gamma=1.0, norm="l1", add_weight=False):
    n = len(t)
    pair_mask = ((t[:, None] < t[None, :]) & (e[:, None] == 1)).astype(np.float64)
    if pair_mask.sum() == 0:
        return 0.0
    pair_diff = pred[:, None].astype(np.float64) - pred[None, :].astype(np.float64)
    pair_loss = np.maximum(gamma + pair_diff, 0.0)
    if add_weight:
        x = pair_diff
        maxx = (x * pair_mask + (1 - 1 / (pair_mask + 1e-5))).max()
        log_ex = x - maxx
        log_softmax = log_ex - np.log((np.exp(log_ex * pair_mask) * pair_mask).sum())
        normed = np.exp(log_softmax * pair_mask) * pair_mask
    else:
        normed = pair_mask / pair_mask.sum()
    if norm == "l2":
        pair_loss = pair_loss * pair_loss
    return float((pair_loss * normed).sum())


@pytest.mark.parametrize("add_weight", [False, True])
@pytest.mark.parametrize("norm", ["l1", "l2"])
def test_rank_loss(add_weight, norm):
    pred, t, e = _rand_surv(23)
    got = losses.rank_loss(pred, t, e, gamma=0.1, norm=norm, add_weight=add_weight)
    want = _rank_oracle(pred, t, e, gamma=0.1, norm=norm, add_weight=add_weight)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)


def test_rank_loss_no_pairs_returns_zero():
    pred = np.array([0.3, 0.5], np.float32)
    t = np.array([1.0, 1.0], np.float32)
    e = np.array([0.0, 0.0], np.float32)
    assert float(losses.rank_loss(pred, t, e)) == 0.0


# -------------------------- mse_loss --------------------------

@pytest.mark.parametrize("inc", [False, True])
def test_mse_loss(inc):
    pred, t, e = _rand_surv(19)
    sq = (pred - t) ** 2
    want = np.mean(e * sq + (inc * (1 - e)) * sq)
    got = losses.mse_loss(pred, t, e, include_censored=inc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# -------------------------- surv_mle_loss --------------------------

def _mle_oracle(h, t, e, alpha=0.0, eps=1e-7, cur_alpha=None):
    B = h.shape[0]
    t = t.reshape(B).astype(int)
    c = 1 - e.reshape(B)
    S = np.cumprod(1 - h, axis=1)
    S_pad = np.concatenate([np.ones((B, 1)), S], axis=1)
    unc = -(1 - c) * (np.log(np.maximum(S_pad[np.arange(B), t], eps))
                      + np.log(np.maximum(h[np.arange(B), t], eps)))
    cen = -c * np.log(np.maximum(S_pad[np.arange(B), t + 1], eps))
    a = alpha if cur_alpha is None else cur_alpha
    return np.mean((1 - a) * (cen + unc) + a * unc)


@pytest.mark.parametrize("alpha", [0.0, 0.4])
def test_surv_mle(alpha):
    B, T = 13, 4
    h = RNG.uniform(0.01, 0.99, size=(B, T)).astype(np.float32)
    t = RNG.integers(0, T, size=B)
    e = (RNG.uniform(size=B) < 0.5).astype(np.float32)
    got = losses.surv_mle_loss(h, t, e, alpha=alpha)
    want = _mle_oracle(h.astype(np.float64), t, e, alpha=alpha)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_surv_mle_weighted_equals_subset():
    B, T = 16, 4
    h = RNG.uniform(0.01, 0.99, size=(B, T)).astype(np.float32)
    t = RNG.integers(0, T, size=B)
    e = (RNG.uniform(size=B) < 0.5).astype(np.float32)
    w = (RNG.uniform(size=B) < 0.6).astype(np.float32)
    keep = w.astype(bool)
    got = losses.surv_mle_loss(h, t, e, weight=w)
    want = _mle_oracle(h[keep].astype(np.float64), t[keep], e[keep])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# -------------------------- surv_ple_loss --------------------------

def _ple_oracle(y_hat, T, E):
    y_hat = np.minimum(y_hat.astype(np.float64), 10.0)
    n = len(T)
    R = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            R[i, j] = T[j] >= T[i]
    theta = y_hat.reshape(-1)
    return -np.mean((theta - np.log(np.sum(np.exp(theta) * R, axis=1))) * E)


def test_surv_ple():
    pred, t, e = _rand_surv(21)
    pred = pred * 15  # exercise the clip-at-10 branch
    got = losses.surv_ple_loss(pred, t, e)
    want = _ple_oracle(pred, t, e)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_surv_ple_weighted_equals_subset():
    pred, t, e = _rand_surv(20)
    w = (RNG.uniform(size=20) < 0.7).astype(np.float32)
    keep = w.astype(bool)
    got = losses.surv_ple_loss(pred, t, e, weight=w)
    want = _ple_oracle(pred[keep], t[keep], e[keep])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# -------------------------- GAN losses --------------------------

def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


@pytest.mark.parametrize("which", ["bce", "hinge", "wasserstein"])
@pytest.mark.parametrize("with_real", [True, False])
def test_real_fake_loss(which, with_real):
    fake = RNG.normal(size=29).astype(np.float32)
    real = RNG.normal(size=17).astype(np.float32) if with_real else None
    got = losses.real_fake_loss(real, fake, which=which)
    if which == "bce":
        want = -np.mean(1.0 - np.log(_sigmoid(fake) + 1e-8))
        if with_real:
            want = want - np.mean(np.log(_sigmoid(real) + 1e-8))
    elif which == "hinge":
        want = np.mean(np.maximum(1.0 + fake, 0))
        if with_real:
            want = want + np.mean(np.maximum(1.0 - real, 0))
    else:
        want = np.mean(fake) - (np.mean(real) if with_real else 0.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_fake_generator_loss():
    fake = RNG.normal(size=11).astype(np.float32)
    np.testing.assert_allclose(np.asarray(losses.fake_generator_loss(fake)),
                               -np.mean(fake), rtol=1e-6)


def test_loss_reg_l1():
    params = {"a": jnp.asarray([[1.0, -2.0]]), "b": {"w": jnp.asarray([3.0])}}
    got = losses.loss_reg_l1(params, 0.1)
    np.testing.assert_allclose(np.asarray(got), 0.6, rtol=1e-6)
    assert float(losses.loss_reg_l1(params, None)) == 0.0


# -------------------------- get_label_mask --------------------------

def test_get_label_mask():
    t = np.array([0, 2, 3], np.int32)
    e = np.array([1, 0, 1], np.float32)
    label, mask = losses.get_label_mask(t, e, bins=4)
    # event: one-hot at t; censored: 1 strictly after t
    np.testing.assert_array_equal(np.asarray(label),
                                  [[1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 0, 1]])
    np.testing.assert_array_equal(np.asarray(mask),
                                  [[1, 0, 0, 0], [1, 1, 1, 0], [1, 1, 1, 1]])
