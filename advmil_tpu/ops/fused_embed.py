"""Fused region patch-embedding kernel: (X @ W + b) -> LayerNorm -> ReLU ->
mean over each group of 16 consecutive rows, in one Pallas pass.

This is the hottest op of the framework (the 1024->384 projection of every
patch, reference AVGPoolPatchEmbedding semantics at
model/backbone_utils.py:158-168). The XLA path writes the [B*N, 384]
activation to HBM and reads it back for the region mean (and again in the
backward); the fused kernel keeps the activation in VMEM and emits only the
16x-smaller region output. Backward is a custom VJP with two Pallas kernels:
dX per row-block, and dW/db/dLN accumulated in VMEM scratch across the
sequential TPU grid.

Padding contract: callers pad bags in whole 16-patch regions; fully-padded
regions produce garbage here and are zeroed by the caller's region mask (for
real regions the plain mean equals the reference's masked mean).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .attention import _HAS_PALLAS

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

S2 = 16          # patches per region (4x4)
BLK_ROWS = 256   # patch rows per grid step (multiple of S2)
LN_EPS = 1e-6    # flax LayerNorm default


def _fwd_kernel(x_ref, w_ref, b_ref, sc_ref, bi_ref, o_ref):
    # keep the MXU inputs in their storage dtype (bf16 under mixed precision;
    # accumulation still f32) — an f32 upcast would halve matmul throughput
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b_ref[:]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    xhat = (h - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = jnp.maximum(xhat * sc_ref[:] + bi_ref[:], 0.0)
    o_ref[:] = jnp.mean(y.reshape(BLK_ROWS // S2, S2, -1), axis=1).astype(o_ref.dtype)


def _recompute(x, w, b, scale, bias):
    """Shared forward recompute used by both backward kernels (f32 accum)."""
    h = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32) + b
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (h - mu) * inv
    y = xhat * scale + bias
    return xhat, inv, (y > 0.0)


def _bwd_g_to_dh(g_ref, x, w, b, scale, bias, D):
    """Upstream region grads -> dL/dh (pre-LN) for one row block; returns
    (dh, xhat, relu_mask) so dW/dscale/dbias reuse the recompute."""
    xhat, inv, relu_on = _recompute(x, w, b, scale, bias)
    g = g_ref[:].astype(jnp.float32) / S2                     # mean backward
    # broadcast each region grad to its 16 rows (reshape-broadcast; gather-free)
    g_rows = jnp.broadcast_to(g[:, None, :], (g.shape[0], S2, g.shape[1]))
    g_rows = g_rows.reshape(g.shape[0] * S2, g.shape[1])      # [BLK_ROWS, D]
    gy = jnp.where(relu_on, g_rows, 0.0)                      # relu backward
    # LayerNorm backward (per row): dh = inv * (gx - mean(gx) - xhat*mean(gx*xhat))
    gx = gy * scale
    m1 = jnp.mean(gx, axis=-1, keepdims=True)
    m2 = jnp.mean(gx * xhat, axis=-1, keepdims=True)
    dh = inv * (gx - m1 - xhat * m2)
    return dh, xhat, gy


def _bwd_dx_kernel(g_ref, x_ref, w_ref, b_ref, sc_ref, bi_ref, dx_ref):
    x = x_ref[:]
    w = w_ref[:]
    D = w.shape[1]
    dh, _, _ = _bwd_g_to_dh(g_ref, x, w, b_ref[:], sc_ref[:], bi_ref[:], D)
    dx_ref[:] = jnp.dot(dh.astype(x.dtype), w.T.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _bwd_dparams_kernel(g_ref, x_ref, w_ref, b_ref, sc_ref, bi_ref,
                        dw_ref, db_ref, dsc_ref, dbi_ref,
                        dw_scr, db_scr, dsc_scr, dbi_scr):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)
        dsc_scr[:] = jnp.zeros_like(dsc_scr)
        dbi_scr[:] = jnp.zeros_like(dbi_scr)

    x = x_ref[:]
    w = w_ref[:]
    D = w.shape[1]
    dh, xhat, gy = _bwd_g_to_dh(g_ref, x, w, b_ref[:], sc_ref[:], bi_ref[:], D)
    dw_scr[:] += jnp.dot(x.T, dh.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    db_scr[:] += jnp.sum(dh, axis=0, keepdims=True)
    dsc_scr[:] += jnp.sum(gy * xhat, axis=0, keepdims=True)
    dbi_scr[:] += jnp.sum(gy, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _emit():
        dw_ref[:] = dw_scr[:].astype(dw_ref.dtype)
        db_ref[:] = db_scr[:].astype(db_ref.dtype)
        dsc_ref[:] = dsc_scr[:].astype(dsc_ref.dtype)
        dbi_ref[:] = dbi_scr[:].astype(dbi_ref.dtype)


def _pad_rows(x, m):
    pad = (-x.shape[0]) % m
    return (jnp.pad(x, ((0, pad), (0, 0))) if pad else x), x.shape[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_region_embedding(x, w, b, scale, bias):
    """[M, K] patches -> [M/16, D] region embeddings (M % 16 == 0).

    Equivalent to mean(relu(LayerNorm(x @ w + b)) over 16-row groups); matches
    AvgPoolPatchEmbedding on region-aligned bags (padding regions must be
    masked by the caller).
    """
    return _fused_fwd_impl(x, w, b, scale, bias)


def _fused_fwd_impl(x, w, b, scale, bias):
    M, K = x.shape
    D = w.shape[1]
    xp, M0 = _pad_rows(x, BLK_ROWS)
    Mp = xp.shape[0]
    grid = (Mp // BLK_ROWS,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK_ROWS, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK_ROWS // S2, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp // S2, D), x.dtype),
    )(xp, w, b.reshape(1, -1).astype(jnp.float32),
      scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return out[: M0 // S2]


def _fused_fwd(x, w, b, scale, bias):
    return _fused_fwd_impl(x, w, b, scale, bias), (x, w, b, scale, bias)


def _fused_bwd(res, g):
    x, w, b, scale, bias = res
    M, K = x.shape
    D = w.shape[1]
    xp, M0 = _pad_rows(x, BLK_ROWS)
    gp, _ = _pad_rows(g.astype(jnp.float32), BLK_ROWS // S2)
    Mp = xp.shape[0]
    grid = (Mp // BLK_ROWS,)
    args = (gp, xp, w, b.reshape(1, -1).astype(jnp.float32),
            scale.reshape(1, -1).astype(jnp.float32),
            bias.reshape(1, -1).astype(jnp.float32))
    common_in_specs = [
        pl.BlockSpec((BLK_ROWS // S2, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK_ROWS, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid=grid,
        in_specs=common_in_specs,
        out_specs=pl.BlockSpec((BLK_ROWS, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K), x.dtype),
    )(*args)[:M0]
    dw, db, dsc, dbi = pl.pallas_call(
        _bwd_dparams_kernel,
        grid=grid,
        in_specs=common_in_specs,
        out_specs=(
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K, D), w.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )(*args)
    return (dx, dw, db.reshape(-1).astype(b.dtype),
            dsc.reshape(-1).astype(scale.dtype),
            dbi.reshape(-1).astype(bias.dtype))


fused_region_embedding.defvjp(_fused_fwd, _fused_bwd)


def reference_region_embedding(x, w, b, scale, bias):
    """Unfused jnp path (the test oracle and CPU fallback)."""
    h = x.astype(jnp.float32) @ w.astype(jnp.float32) + b
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    xhat = (h - mu) * jax.lax.rsqrt(var + LN_EPS)
    y = jnp.maximum(xhat * scale + bias, 0.0)
    M, D = y.shape
    return jnp.mean(y.reshape(M // S2, S2, D), axis=1).astype(x.dtype)
