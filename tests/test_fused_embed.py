"""Fused region-embedding kernel: forward and VJP parity against the unfused
jnp oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmil_tpu.ops.attention import _HAS_PALLAS

if not _HAS_PALLAS:
    pytest.skip("pallas unavailable", allow_module_level=True)

from jax.experimental.pallas import tpu as pltpu
from advmil_tpu.ops.fused_embed import (fused_region_embedding,
                                        reference_region_embedding, BLK_ROWS)

RNG = np.random.default_rng(17)


def _params(K=128, D=128):
    w = jnp.asarray(RNG.normal(0, 0.05, size=(K, D)), jnp.float32)
    b = jnp.asarray(RNG.normal(0, 0.1, size=(D,)), jnp.float32)
    scale = jnp.asarray(1.0 + RNG.normal(0, 0.1, size=(D,)), jnp.float32)
    bias = jnp.asarray(RNG.normal(0, 0.1, size=(D,)), jnp.float32)
    return w, b, scale, bias


@pytest.mark.parametrize("M", [BLK_ROWS, BLK_ROWS * 2, BLK_ROWS + 64])
def test_forward_matches_reference(M):
    K = D = 128
    x = jnp.asarray(RNG.normal(size=(M, K)), jnp.float32)
    w, b, scale, bias = _params(K, D)
    want = reference_region_embedding(x, w, b, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = fused_region_embedding(x, w, b, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_vjp_matches_reference():
    M, K, D = BLK_ROWS + 128, 128, 128
    x = jnp.asarray(RNG.normal(size=(M, K)), jnp.float32)
    w, b, scale, bias = _params(K, D)
    g = jnp.asarray(RNG.normal(size=(M // 16, D)), jnp.float32)

    def loss_ref(x, w, b, sc, bi):
        return jnp.sum(reference_region_embedding(x, w, b, sc, bi) * g)

    def loss_fused(x, w, b, sc, bi):
        return jnp.sum(fused_region_embedding(x, w, b, sc, bi) * g)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
    for name, a, e in zip(["dx", "dw", "db", "dscale", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_fused_esat_backbone_matches_unfused():
    """ESAT with use_fused_embed produces the same params/outputs/grads as the
    unfused path (interpret mode)."""
    import advmil_tpu.ops.attention as att
    from advmil_tpu.models.backbones import DualTransHS
    import jax.tree_util as jtu
    orig = att.pallas_available
    att.pallas_available = lambda: True
    try:
        x = jnp.asarray(RNG.normal(size=(2, 64, 64)), jnp.float32)
        mask = np.ones((2, 64), np.float32)
        mask[0, 48:] = 0
        mask = jnp.asarray(mask)
        # use_lnpool off on both: this test isolates the fused-embed kernel
        # (with pallas_available monkeypatched True, the lnpool default would
        # otherwise fire outside the interpret context)
        m_ref = DualTransHS((64, 32, 32), nhead=4, use_pallas=False,
                            use_lnpool=False)
        m_fused = DualTransHS((64, 32, 32), nhead=4, use_pallas=False,
                              use_fused_embed=True, use_lnpool=False)
        key = jax.random.PRNGKey(0)
        v = m_ref.init({"params": key, "dropout": key}, x, mask, None,
                       deterministic=True)
        want = m_ref.apply(v, x, mask, None, deterministic=True)
        with pltpu.force_tpu_interpret_mode():
            got = m_fused.apply(v, x, mask, None, deterministic=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        def loss(v, m):
            return jnp.sum(m.apply(v, x, mask, None, deterministic=True) ** 2)

        g_ref = jax.grad(lambda vv: loss(vv, m_ref))(v)
        with pltpu.force_tpu_interpret_mode():
            g_fus = jax.grad(lambda vv: loss(vv, m_fused))(v)
        for a, b in zip(jtu.tree_leaves(g_ref), jtu.tree_leaves(g_fus)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        att.pallas_available = orig
