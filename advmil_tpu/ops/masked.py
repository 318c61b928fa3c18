"""Mask-correct reductions for padded bags.

The reference processes exact-length bags one at a time (B=1, no masking
anywhere). Batched padded bags on TPU require every softmax/mean over the
instance axis to ignore padding so that the padded result equals the
reference's unpadded result bit-for-bit (up to float assoc.).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over ``axis`` restricted to mask==1 entries; masked entries get 0.

    Fully-masked slices return all-zeros instead of NaN (needed for dummy
    padding bags in ragged tail batches).
    """
    mask = mask.astype(bool)
    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    s = jnp.where(mask, scores, neg)
    s_max = jax.lax.stop_gradient(jnp.max(s, axis=axis, keepdims=True))
    ex = jnp.exp(s - s_max) * mask.astype(scores.dtype)
    denom = jnp.sum(ex, axis=axis, keepdims=True)
    return ex / jnp.maximum(denom, jnp.asarray(1e-30, scores.dtype))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Mean over ``axis`` counting only mask==1 entries (mask broadcast to x)."""
    m = mask.astype(x.dtype)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, jnp.asarray(1.0, x.dtype))


def region_mask_from_patch_mask(mask: jnp.ndarray, scale: int = 4) -> jnp.ndarray:
    """[B, N] patch mask -> [B, N/s^2] region mask (region valid if any patch is).

    The data layer pads patch counts in whole 4x4 regions so a region is either
    fully real or fully padding (reference tools/big_to_small_patching.py:40-76
    guarantees N % 16 == 0 for real data).
    """
    B, N = mask.shape
    s2 = scale * scale
    return jnp.any(mask.reshape(B, N // s2, s2).astype(bool), axis=-1)
