"""Pallas masked flash attention vs the materializing reference path.

Forward and backward (custom VJP) run here in interpret mode; the in-kernel
dropout paths need the TPU core PRNG (no interpret lowering) and are
validated on hardware by scripts/tpu_flash_check.py, including an exact
materialized-keep-mask oracle for the dropout gradients.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmil_tpu.ops.attention import (masked_flash_attention,
                                      masked_attention_reference)

RNG = np.random.default_rng(3)


def _mk(B, L, H, Dh):
    q = jnp.asarray(RNG.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(B, L, H, Dh)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("B,L,H,Dh", [(2, 300, 8, 48), (1, 256, 2, 64), (3, 520, 4, 48)])
def test_flash_matches_reference(B, L, H, Dh):
    q, k, v = _mk(B, L, H, Dh)
    mask = np.ones((B, L), np.float32)
    mask[0, L // 2:] = 0  # padded tail
    mask = jnp.asarray(mask)
    ref = masked_attention_reference(q, k, v, mask) * mask[:, :, None, None]
    out = masked_flash_attention(q, k, v, mask, interpret=True) * mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_flash_dummy_bag_all_masked_is_zero():
    q, k, v = _mk(2, 256, 2, 48)
    mask = np.ones((2, 256), np.float32)
    mask[1, :] = 0  # dummy padding bag
    out = masked_flash_attention(q, k, v, jnp.asarray(mask), interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)


@pytest.mark.parametrize("B,L,H,Dh", [(2, 300, 4, 48), (1, 256, 2, 64)])
def test_flash_grad_matches_reference(B, L, H, Dh):
    """The custom VJP (recompute-based flash backward kernels) must match
    jax.grad through the materializing einsum path (VERDICT r2 #1)."""
    q, k, v = _mk(B, L, H, Dh)
    mask = np.ones((B, L), np.float32)
    mask[0, L // 2:] = 0
    mask = jnp.asarray(mask)
    mexp = mask[:, :, None, None]

    def loss_flash(q, k, v):
        o = masked_flash_attention(q, k, v, mask, interpret=True) * mexp
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = masked_attention_reference(q, k, v, mask) * mexp
        return jnp.sum(jnp.sin(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_flash_grad_dummy_bag_finite_and_zero():
    """Fully-masked dummy bags must yield finite, exactly-zero grads (the
    recomputed probs use a where-select so exp overflow never meets 0*inf)."""
    q, k, v = _mk(2, 256, 2, 48)
    mask = np.ones((2, 256), np.float32)
    mask[1, :] = 0
    mask[0, 100:] = 0
    mask = jnp.asarray(mask)

    def loss(q, k, v):
        o = masked_flash_attention(q, k, v, mask, interpret=True) \
            * mask[:, :, None, None]
        return jnp.sum(o ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g)[1], 0.0)


def test_flash_grad_through_value_only():
    """dV alone (linear path) is exact: flash probs times cotangent."""
    q, k, v = _mk(1, 256, 2, 48)
    mask = jnp.ones((1, 256), jnp.float32)
    co = jnp.asarray(RNG.normal(size=v.shape), jnp.float32)

    def out_flash(v):
        return jnp.vdot(masked_flash_attention(q, k, v, mask, interpret=True), co)

    def out_ref(v):
        return jnp.vdot(masked_attention_reference(q, k, v, mask), co)

    gf = jax.grad(out_flash)(v)
    gr = jax.grad(out_ref)(v)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-5, rtol=2e-4)


def test_flash_padding_invariance():
    """Extending a bag with masked padding must not change real outputs."""
    B, L, H, Dh = 1, 256, 2, 48
    q, k, v = _mk(B, L, H, Dh)
    mask = jnp.ones((B, L), jnp.float32)
    out_small = masked_flash_attention(q, k, v, mask, interpret=True)
    pad = 256
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, pad)))
    out_big = masked_flash_attention(qp, kp, vp, mp, interpret=True)
    np.testing.assert_allclose(np.asarray(out_big)[:, :L], np.asarray(out_small),
                               atol=1e-6)
