"""Fused LN+ReLU+region-mean kernel (ops/ln_pool.py): forward and VJP parity
against the unfused jnp oracle (interpret mode on CPU), plus module-level
equivalence of the AvgPoolPatchEmbedding fused path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmil_tpu.ops.attention import _HAS_PALLAS

if not _HAS_PALLAS:
    pytest.skip("pallas unavailable", allow_module_level=True)

from jax.experimental.pallas import tpu as pltpu
from advmil_tpu.ops.ln_pool import (ln_relu, ln_relu_region_mean,
                                    reference_ln_relu,
                                    reference_ln_relu_region_mean, BLK_ROWS)

RNG = np.random.default_rng(23)


def _params(D):
    scale = jnp.asarray(1.0 + RNG.normal(0, 0.1, size=(D,)), jnp.float32)
    bias = jnp.asarray(RNG.normal(0, 0.1, size=(D,)), jnp.float32)
    return scale, bias


@pytest.mark.parametrize("M,D", [(BLK_ROWS, 128), (BLK_ROWS * 2, 128),
                                 (BLK_ROWS + 64, 256), (256, 128)])
def test_forward_matches_reference(M, D):
    h = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    scale, bias = _params(D)
    want = reference_ln_relu_region_mean(h, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = ln_relu_region_mean(h, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_vjp_matches_reference():
    M, D = BLK_ROWS + 128, 128
    h = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    scale, bias = _params(D)
    g = jnp.asarray(RNG.normal(size=(M // 16, D)), jnp.float32)

    def loss_ref(h, sc, bi):
        return jnp.sum(reference_ln_relu_region_mean(h, sc, bi) * g)

    def loss_fused(h, sc, bi):
        return jnp.sum(ln_relu_region_mean(h, sc, bi) * g)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(h, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(h, scale, bias)
    for name, a, e in zip(["dh", "dscale", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("M,D", [(BLK_ROWS, 128), (BLK_ROWS + 40, 256)])
def test_ln_relu_forward_matches_reference(M, D):
    h = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    scale, bias = _params(D)
    want = reference_ln_relu(h, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = ln_relu(h, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_ln_relu_vjp_matches_reference():
    M, D = BLK_ROWS + 72, 128
    h = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)
    scale, bias = _params(D)
    g = jnp.asarray(RNG.normal(size=(M, D)), jnp.float32)

    def loss_ref(h, sc, bi):
        return jnp.sum(reference_ln_relu(h, sc, bi) * g)

    def loss_fused(h, sc, bi):
        return jnp.sum(ln_relu(h, sc, bi) * g)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(h, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(h, scale, bias)
    for name, a, e in zip(["dh", "dscale", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_ln_relu_under_vmap():
    """ln_relu per-bag under vmap: values and ALL grads match — including
    dscale/dbias, whose scratch accumulation must survive the batched grid
    (vmap adds a grid dimension around the kernel's sequential row blocks)."""
    B, N, D = 3, 2100, 128  # N spans >1 row block so accumulation is real
    h = jnp.asarray(RNG.normal(size=(B, N, D)), jnp.float32)
    scale, bias = _params(D)

    def loss(f, h, sc, bi):
        return jnp.sum(jax.vmap(lambda x: f(x, sc, bi))(h) ** 2) / (B * N)

    want = jax.grad(lambda h, s, b: loss(reference_ln_relu, h, s, b),
                    argnums=(0, 1, 2))(h, scale, bias)
    with pltpu.force_tpu_interpret_mode():
        got_val = loss(ln_relu, h, scale, bias)
        got = jax.grad(lambda h, s, b: loss(ln_relu, h, s, b),
                       argnums=(0, 1, 2))(h, scale, bias)
    np.testing.assert_allclose(float(got_val),
                               float(loss(reference_ln_relu, h, scale, bias)),
                               rtol=1e-5)
    for name, a, e in zip(["dh", "dscale", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_lnpool_embedding_matches_unfused():
    """AvgPoolPatchEmbedding with use_lnpool produces the same outputs/grads
    as the unfused path on whole-region masks (interpret mode)."""
    import advmil_tpu.ops.attention as att
    from advmil_tpu.models.layers import AvgPoolPatchEmbedding
    import jax.tree_util as jtu
    orig = att.pallas_available
    att.pallas_available = lambda: True
    try:
        x = jnp.asarray(RNG.normal(size=(2, 64, 64)), jnp.float32)
        mask = np.ones((2, 64), np.float32)
        mask[0, 48:] = 0  # whole 16-patch region padded
        mask = jnp.asarray(mask)
        m_ref = AvgPoolPatchEmbedding(64, 128, use_lnpool=False)
        m_fus = AvgPoolPatchEmbedding(64, 128, use_lnpool=True)
        key = jax.random.PRNGKey(0)
        v = m_ref.init({"params": key}, x, mask, deterministic=True)
        want = m_ref.apply(v, x, mask, deterministic=True)
        with pltpu.force_tpu_interpret_mode():
            got = m_fus.apply(v, x, mask, deterministic=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        def loss(v, m):
            return jnp.sum(m.apply(v, x, mask, deterministic=True) ** 2)

        g_ref = jax.grad(lambda vv: loss(vv, m_ref))(v)
        with pltpu.force_tpu_interpret_mode():
            g_fus = jax.grad(lambda vv: loss(vv, m_fus))(v)
        for a, b in zip(jtu.tree_leaves(g_ref), jtu.tree_leaves(g_fus)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        att.pallas_available = orig


def test_lnpool_embedding_bf16_close_to_unfused():
    """Under precision=bf16 the kernel path tracks the unfused flax path
    within bf16 rounding (stats are f32 in both)."""
    import advmil_tpu.ops.attention as att
    from advmil_tpu.models import layers as L
    orig = att.pallas_available
    att.pallas_available = lambda: True
    L.set_compute_dtype("bf16")
    try:
        x = jnp.asarray(RNG.normal(size=(2, 64, 64)), jnp.float32)
        mask = jnp.ones((2, 64), jnp.float32)
        m_ref = L.AvgPoolPatchEmbedding(64, 128, use_lnpool=False)
        m_fus = L.AvgPoolPatchEmbedding(64, 128, use_lnpool=True)
        v = m_ref.init({"params": jax.random.PRNGKey(0)}, x, mask,
                       deterministic=True)
        want = np.asarray(m_ref.apply(v, x, mask, deterministic=True),
                          np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(m_fus.apply(v, x, mask, deterministic=True),
                             np.float32)
        assert got.dtype == want.dtype
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02)
    finally:
        att.pallas_available = orig
        L.set_compute_dtype("f32")


def test_lnpool_falls_back_on_odd_dims():
    """out_dim not a lane multiple -> unfused path (still correct)."""
    import advmil_tpu.ops.attention as att
    from advmil_tpu.models.layers import AvgPoolPatchEmbedding
    orig = att.pallas_available
    att.pallas_available = lambda: True
    try:
        x = jnp.asarray(RNG.normal(size=(1, 32, 48)), jnp.float32)
        mask = jnp.ones((1, 32), jnp.float32)
        m = AvgPoolPatchEmbedding(48, 96, use_lnpool=True)
        v = m.init({"params": jax.random.PRNGKey(0)}, x, mask,
                   deterministic=True)
        out = m.apply(v, x, mask, deterministic=True)  # no pallas call needed
        assert out.shape == (1, 2, 96)
        assert np.isfinite(np.asarray(out)).all()
    finally:
        att.pallas_available = orig


def test_block_rows_override_is_equivalent():
    """set_lnpool_block_rows changes tiling only, never values (sweep hook)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from advmil_tpu.ops.ln_pool import (ln_relu_region_mean,
                                        set_lnpool_block_rows)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.standard_normal((1024, 128)), jnp.float32)
    sc = jnp.asarray(1.0 + 0.1 * rng.standard_normal(128), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal(128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        base = ln_relu_region_mean(h, sc, bi)
        try:
            for rows in (256, 2048):  # smaller and larger than M
                set_lnpool_block_rows(rows)
                np.testing.assert_allclose(
                    np.asarray(ln_relu_region_mean(h, sc, bi)),
                    np.asarray(base), rtol=1e-6, atol=1e-6)
        finally:
            set_lnpool_block_rows(None)
