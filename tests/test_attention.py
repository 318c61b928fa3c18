"""Pallas masked flash attention vs the materializing reference path."""
import numpy as np
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
