"""Pallas banded-aggregation kernel (ops/banded_pallas.py) vs the jnp
oracles, in interpret mode (CPU). Hardware timing lives in
scripts/bench_banded_kernel.py; semantics are fully covered here because
the kernel has no TPU-only primitives (unlike the flash-attention PRNG)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advmil_tpu.ops.segment import (band_coverage, build_band_tables,
                                    knn_edge_softmax_aggregate)
from advmil_tpu.ops.banded_pallas import (build_u_inv, build_u_tables,
                                          pallas_banded_aggregate)

RNG = np.random.default_rng(7)


def pba(y, args, t, u_inv=None, interpret=True):
    """Interpret-mode call helper (keeps the positional interpret flag
    straight now that u_inv sits between t and interpret)."""
    return pallas_banded_aggregate(y, *args, t, u_inv, interpret)


def raster_graph(N, W, epn=9, drop=0.03, irregular=0, rng=RNG):
    offs_true = [-W - 1, -W, -W + 1, -1, 0, 1, W - 1, W, W + 1][:epn]
    esrc = np.zeros((N, epn), np.int32)
    em = np.zeros((N, epn), np.float32)
    for s, o in enumerate(offs_true):
        tgt = np.arange(N) + o
        ok = (tgt >= 0) & (tgt < N) & (rng.random(N) >= drop)
        esrc[ok, s] = tgt[ok]
        em[ok, s] = 1.0
    for _ in range(irregular):
        n, s = rng.integers(N), rng.integers(epn)
        esrc[n, s] = rng.integers(N)
        em[n, s] = 1.0
    return esrc, em


def banded_args(esrc, em):
    offs, bmask, *_ = build_band_tables(esrc, em)
    u_rows, u_src, u_emask = build_u_tables(esrc, em, bmask)
    return tuple(jnp.asarray(a) for a in (offs, bmask, u_rows, u_src,
                                          u_emask))


@pytest.mark.parametrize("N,W,irregular", [(300, 17, 30), (64, 8, 0),
                                           (520, 23, 80)])
def test_forward_matches_oracle(N, W, irregular):
    esrc, em = raster_graph(N, W, irregular=irregular)
    args = banded_args(esrc, em)
    y = jnp.asarray(RNG.standard_normal((N, 132)), jnp.float32)
    t = jnp.float32(1.7)
    oracle = knn_edge_softmax_aggregate(y[esrc], jnp.asarray(em), t)
    got = pba(y, args, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               atol=2e-5)


def test_grad_matches_oracle_autodiff():
    N, W, C = 300, 17, 64
    esrc, em = raster_graph(N, W, irregular=25)
    args = banded_args(esrc, em)
    y = jnp.asarray(RNG.standard_normal((N, C)), jnp.float32)
    t = jnp.float32(1.3)

    def f_oracle(y, t):
        return jnp.sum(jnp.sin(knn_edge_softmax_aggregate(
            y[esrc], jnp.asarray(em), t)))

    def f_pallas(y, t):
        return jnp.sum(jnp.sin(pba(y, args, t)))

    go = jax.grad(f_oracle, argnums=(0, 1))(y, t)
    gp = jax.grad(f_pallas, argnums=(0, 1))(y, t)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(go[0]),
                               atol=5e-5)
    np.testing.assert_allclose(float(gp[1]), float(go[1]), rtol=5e-5)


def test_vmap_batched():
    N, W = 280, 15
    esrc, em = raster_graph(N, W, irregular=10)
    args = banded_args(esrc, em)
    t = jnp.float32(0.9)
    yb = jnp.asarray(RNG.standard_normal((3, N, 128)), jnp.float32)
    outb = jax.vmap(lambda y: pba(y, args, t))(yb)
    for b in range(3):
        oracle = knn_edge_softmax_aggregate(yb[b][esrc], jnp.asarray(em), t)
        np.testing.assert_allclose(np.asarray(outb[b]), np.asarray(oracle),
                                   atol=2e-5)


def test_zero_edge_rows_and_no_residuals():
    # fully regular band -> zero residual rows; plus a node with no edges
    N, W = 200, 11
    esrc, em = raster_graph(N, W, drop=0.0)
    em[57, :] = 0.0  # isolated node aggregates to zeros
    args = banded_args(esrc, em)
    assert int((np.asarray(args[2]) < N).sum()) <= 2 * (W + 2)
    y = jnp.asarray(RNG.standard_normal((N, 128)), jnp.float32)
    out = pba(y, args, jnp.float32(1.0))
    oracle = knn_edge_softmax_aggregate(y[esrc], jnp.asarray(em),
                                        jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               atol=2e-5)
    assert np.allclose(np.asarray(out)[57], 0.0)


def test_bf16_inputs():
    N, W = 300, 17
    esrc, em = raster_graph(N, W, irregular=12)
    args = banded_args(esrc, em)
    y = jnp.asarray(RNG.standard_normal((N, 128)), jnp.bfloat16)
    t = jnp.float32(1.0)
    out = pba(y, args, t)
    assert out.dtype == jnp.bfloat16
    oracle = knn_edge_softmax_aggregate(
        y.astype(jnp.float32)[esrc], jnp.asarray(em), t)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(oracle), atol=2e-2)


def test_band_coverage_reports_rows_and_offsets():
    esrc, em = raster_graph(240, 13, irregular=15)
    cov, nres, nrows, omax = band_coverage(esrc, em)
    offs, bmask, *_ = build_band_tables(esrc, em)
    resid_rows = np.unique(np.nonzero((em > 0) & (bmask <= 0))[0])
    assert nrows == len(resid_rows)
    assert omax == int(np.abs(offs).max())
    assert 0.7 < cov <= 1.0


def test_grad_ignores_sentinel_u_rows():
    # u tables padded far beyond the real residual count must not change
    # values or grads
    N, W, C = 180, 10, 64
    esrc, em = raster_graph(N, W, irregular=8)
    offs, bmask, *_ = build_band_tables(esrc, em)
    u8 = build_u_tables(esrc, em, bmask)
    u64 = build_u_tables(esrc, em, bmask, u_slots=64)
    y = jnp.asarray(RNG.standard_normal((N, C)), jnp.float32)
    t = jnp.float32(1.1)

    def f(u):
        return jax.grad(lambda yy: jnp.sum(jnp.cos(pba(
            yy, (jnp.asarray(offs), jnp.asarray(bmask),
                 *(jnp.asarray(a) for a in u)), t))))(y)

    np.testing.assert_allclose(np.asarray(f(u8)), np.asarray(f(u64)),
                               atol=1e-6)


def test_u_inv_path_matches_scatter_path():
    # the batcher-shipped inverse map must reproduce the scatter overwrite
    # exactly — values, dy, and dt — including sentinel-padded u slots and
    # under vmap (the shipped per-batch layout)
    N, W, C = 300, 17, 64
    esrc, em = raster_graph(N, W, irregular=25)
    args = banded_args(esrc, em)
    u_inv = jnp.asarray(build_u_inv(np.asarray(args[2]), N))
    y = jnp.asarray(RNG.standard_normal((N, C)), jnp.float32)
    t = jnp.float32(1.3)
    np.testing.assert_array_equal(np.asarray(pba(y, args, t, u_inv)),
                                  np.asarray(pba(y, args, t)))

    def loss(u):
        return lambda yy, tt: jnp.sum(jnp.sin(pba(yy, args, tt, u)))

    g_inv = jax.grad(loss(u_inv), argnums=(0, 1))(y, t)
    g_sc = jax.grad(loss(None), argnums=(0, 1))(y, t)
    np.testing.assert_allclose(np.asarray(g_inv[0]), np.asarray(g_sc[0]),
                               atol=1e-6)
    np.testing.assert_allclose(float(g_inv[1]), float(g_sc[1]), rtol=1e-6)
    yb = jnp.asarray(RNG.standard_normal((2, N, C)), jnp.float32)
    ob = jax.vmap(lambda yy, u: pba(yy, args, t, u),
                  in_axes=(0, None))(yb, u_inv)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(ob[b]),
                                      np.asarray(pba(yb[b], args, t)))
