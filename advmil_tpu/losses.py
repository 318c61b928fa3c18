"""Survival + adversarial losses as pure JAX functions.

Semantics mirror the reference implementation (reference loss/utils.py:6-208,
utils/func.py:59-64) but every loss takes an optional per-sample ``weight``
vector so that padded/invisible samples in a batched, masked TPU pipeline drop
out exactly — a weighted mean with 0/1 weights equals the reference's mean over
the concatenated per-bag tensors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_LOG = 1e-8


def _wmean(x: jnp.ndarray, weight: jnp.ndarray | None) -> jnp.ndarray:
    """Weighted mean; with weight=None it is a plain mean. All-zero weights -> 0."""
    if weight is None:
        return jnp.mean(x)
    weight = jnp.asarray(weight, x.dtype)
    denom = jnp.sum(weight)
    return jnp.where(denom > 0, jnp.sum(x * weight) / jnp.maximum(denom, 1e-12), 0.0)


# ---------------------------------------------------------------------------
# Continuous-time supervised losses (reference loss/utils.py:21-95)
# ---------------------------------------------------------------------------

def recon_loss(pred_t, t, e, alpha: float = 0.0, gamma: float = 1.0, norm: str = "l1",
               cur_alpha=None, weight=None):
    """Continuous survival reconstruction loss.

    event (e=1):    |t_hat - t|
    censored (e=0): relu(gamma - (t_hat - t))   (push t_hat beyond t)
    blended:        (1-alpha) * (obs + cen) + alpha * obs, then (weighted) mean.
    (reference loss/utils.py:21-41)
    """
    pred_t = jnp.reshape(pred_t, (-1,))
    t = jnp.reshape(t, (-1,)).astype(pred_t.dtype)
    e = jnp.reshape(e, (-1,)).astype(pred_t.dtype)
    loss_obs = e * jnp.abs(pred_t - t)
    loss_cen = (1.0 - e) * jax.nn.relu(gamma - (pred_t - t))
    if norm == "l2":
        loss_obs = loss_obs * loss_obs
        loss_cen = loss_cen * loss_cen
    elif norm != "l1":
        raise NotImplementedError(f"recon_loss norm must be l1/l2, got {norm}")
    loss_recon = loss_obs + loss_cen
    _alpha = alpha if cur_alpha is None else cur_alpha
    per_sample = (1.0 - _alpha) * loss_recon + _alpha * loss_obs
    return _wmean(per_sample, weight)


def rank_loss(pred_t, t, e, gamma: float = 1.0, norm: str = "l1", add_weight: bool = False):
    """Pairwise ranking hinge on comparable pairs (t_i < t_j, e_i = 1).

    Reproduces the reference exactly, including the masked-log-softmax weighting
    quirk when ``add_weight`` (reference loss/utils.py:43-80). Returns 0 when
    there is no comparable pair.
    """
    pred_t = jnp.reshape(pred_t, (-1,))
    t = jnp.reshape(t, (-1,))
    e = jnp.reshape(e, (-1,))
    pair_mask = ((t[:, None] < t[None, :]) & (e[:, None] == 1)).astype(pred_t.dtype)
    any_pair = jnp.sum(pair_mask) > 0
    pair_diff = pred_t[:, None] - pred_t[None, :]  # the lower, the better
    pair_loss = jax.nn.relu(gamma + pair_diff)
    if add_weight:
        x = pair_diff
        maxx = jnp.max(x * pair_mask + (1.0 - 1.0 / (pair_mask + 1e-5)))
        log_ex = x - maxx
        log_softmax = log_ex - jnp.log(jnp.sum(jnp.exp(log_ex * pair_mask) * pair_mask))
        normed_weight = jnp.exp(log_softmax * pair_mask) * pair_mask
    else:
        normed_weight = pair_mask / jnp.maximum(jnp.sum(pair_mask), 1e-12)
    if norm == "l2":
        pair_loss = pair_loss * pair_loss
    elif norm != "l1":
        raise NotImplementedError(f"rank_loss norm must be l1/l2, got {norm}")
    loss = jnp.sum(pair_loss * normed_weight)
    return jnp.where(any_pair, loss, 0.0)


def mse_loss(pred_t, t, e, include_censored: bool = False, weight=None):
    """ESAT-reproduction MSE on events (optionally also censored).
    (reference loss/utils.py:82-95)"""
    pred_t = jnp.reshape(pred_t, (-1,))
    t = jnp.reshape(t, (-1,)).astype(pred_t.dtype)
    e = jnp.reshape(e, (-1,)).astype(pred_t.dtype)
    sq = (pred_t - t) * (pred_t - t)
    loss = e * sq
    if include_censored:
        loss = loss + (1.0 - e) * sq
    return _wmean(loss, weight)


# ---------------------------------------------------------------------------
# Discrete-time NLL (reference loss/utils.py:98-134)
# ---------------------------------------------------------------------------

def surv_mle_loss(hazards, t, e, alpha: float = 0.0, eps: float = 1e-7,
                  cur_alpha=None, weight=None):
    """Discrete-time MLE (MCAT-style).

    hazards: [B, T] hazard probabilities; t: [B] int bin index; e: [B] event.
    S = cumprod(1-h); S padded with 1 at index 0.
    uncensored: -log S[t] - log h[t];  censored: -log S[t+1].
    loss = (1-alpha) * (cens + uncens) + alpha * uncens, mean.
    """
    hazards = jnp.asarray(hazards)
    B = hazards.shape[0]
    t = jnp.reshape(t, (B, 1)).astype(jnp.int32)
    c = 1.0 - jnp.reshape(e, (B, 1)).astype(hazards.dtype)
    S = jnp.cumprod(1.0 - hazards, axis=1)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)
    s_at_t = jnp.take_along_axis(S_padded, t, axis=1)
    h_at_t = jnp.take_along_axis(hazards, t, axis=1)
    s_at_t1 = jnp.take_along_axis(S_padded, t + 1, axis=1)
    uncensored = -(1.0 - c) * (jnp.log(jnp.clip(s_at_t, min=eps))
                               + jnp.log(jnp.clip(h_at_t, min=eps)))
    censored = -c * jnp.log(jnp.clip(s_at_t1, min=eps))
    neg_l = censored + uncensored
    _alpha = alpha if cur_alpha is None else cur_alpha
    per_sample = ((1.0 - _alpha) * neg_l + _alpha * uncensored)[:, 0]
    return _wmean(per_sample, weight)


# ---------------------------------------------------------------------------
# Cox partial likelihood (Breslow) (reference loss/utils.py:137-175)
# ---------------------------------------------------------------------------

def surv_ple_loss(y_hat, t, e, weight=None):
    """Cox partial likelihood (no ties). Risk set built by broadcasting instead
    of the reference's O(B^2) Python double loop. y_hat clipped at 10 for
    numerical stability, as in the reference.

    With ``weight`` (0/1 per sample), excluded samples drop from both the risk
    sets and the outer mean.
    """
    theta = jnp.reshape(y_hat, (-1,))
    theta = jnp.minimum(theta, 10.0)
    t = jnp.reshape(t, (-1,))
    e = jnp.reshape(e, (-1,)).astype(theta.dtype)
    # R[i, j] = 1 if t_j >= t_i  (j still at risk when i fails)
    R = (t[None, :] >= t[:, None]).astype(theta.dtype)
    if weight is not None:
        w = jnp.reshape(jnp.asarray(weight, theta.dtype), (-1,))
        R = R * w[None, :]
        e = e * w
    exp_theta = jnp.exp(theta)
    risk_logsum = jnp.log(jnp.maximum(jnp.sum(exp_theta[None, :] * R, axis=1), 1e-30))
    per_sample = (theta - risk_logsum) * e
    if weight is None:
        return -jnp.mean(per_sample)
    # the reference means over the batch incl. zero terms; with masking we mean
    # over the kept samples only so padded batches match the unpadded result
    denom = jnp.maximum(jnp.sum(jnp.reshape(jnp.asarray(weight, theta.dtype), (-1,))), 1e-12)
    return -jnp.sum(per_sample) / denom


# ---------------------------------------------------------------------------
# GAN losses (reference loss/utils.py:182-208)
# ---------------------------------------------------------------------------

def real_fake_loss(real, fake, which: str = "bce", real_weight=None, fake_weight=None):
    """Discriminator loss over real/fake scores.

    ``bce`` reproduces the reference's exact (nonstandard) form:
        -mean(1 - log(sigmoid(fake) + 1e-8)) - mean(log(sigmoid(real) + 1e-8))
    (reference loss/utils.py:182-203). ``real=None`` gives the fake-only value
    used at eval time.
    """
    fake = jnp.reshape(fake, (-1,))
    if which == "bce":
        fake_s = jax.nn.sigmoid(fake)
        loss = -_wmean(1.0 - jnp.log(fake_s + _EPS_LOG), fake_weight)
        if real is not None:
            real_s = jax.nn.sigmoid(jnp.reshape(real, (-1,)))
            loss = loss - _wmean(jnp.log(real_s + _EPS_LOG), real_weight)
    elif which == "hinge":
        loss = _wmean(jax.nn.relu(1.0 + fake), fake_weight)
        if real is not None:
            real = jnp.reshape(real, (-1,))
            loss = loss + _wmean(jax.nn.relu(1.0 - real), real_weight)
    elif which == "wasserstein":
        loss = _wmean(fake, fake_weight)
        if real is not None:
            loss = loss - _wmean(jnp.reshape(real, (-1,)), real_weight)
    else:
        raise ValueError(f"real_fake_loss `which` must be bce/hinge/wasserstein, got {which}")
    return loss


def fake_generator_loss(fake_score, weight=None):
    """Generator adversarial loss: -mean(pre-sigmoid fake score).
    (reference loss/utils.py:205-208)"""
    return -_wmean(jnp.reshape(fake_score, (-1,)), weight)


def loss_reg_l1(params, coef: float) -> jnp.ndarray:
    """L1 penalty over a parameter pytree (reference loss/utils.py:6-14)."""
    if coef is None or coef <= 1e-8:
        return jnp.asarray(0.0, jnp.float32)
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(jnp.sum(jnp.abs(w)) for w in leaves)
    return coef * total


# ---------------------------------------------------------------------------
# Discrete-task label/mask construction (reference utils/func.py:59-64)
# ---------------------------------------------------------------------------

def get_label_mask(t, e, bins: int):
    """label = (z > t) if censored else (z == t); mask = (z <= t); z = 0..bins-1.

    t: [B] or [B,1] discrete bin; e: event indicator (censorship c = 1 - e).
    Returns (label [B,bins] float, mask [B,bins] float).
    """
    t = jnp.reshape(t, (-1, 1))
    c = 1.0 - jnp.reshape(e, (-1, 1)).astype(jnp.float32)
    z = jnp.arange(bins, dtype=t.dtype)[None, :]
    label = jnp.where(c.astype(bool), z > t, z == t).astype(jnp.float32)
    mask = (z <= t).astype(jnp.float32)
    return label, mask
