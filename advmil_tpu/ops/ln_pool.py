"""Fused LayerNorm -> ReLU -> 16-row region mean, WITHOUT the matmul.

The ESAT/netx patch embedding is Dense -> LayerNorm -> ReLU -> mean over each
4x4 region (reference AVGPoolPatchEmbedding, model/backbone_utils.py:158-168;
the same module is the discriminator's X tower via make_embedding_layer,
model/model_utils.py:101-111,188-210). The round-3 step profile
(scripts/profile_headline.py) shows these LayerNorm chains are ~30% of the
headline adversarial step, running at ~300 GB/s: XLA writes the normalized
[B*N, D] activation to HBM and reads it back for the pool, and the backward
re-reads it again. This kernel reads the pre-LN activation once and emits only
the 16x-smaller pooled output (backward: one pass producing dh + per-block
dscale/dbias partials, recomputing the LN stats instead of saving them).

Unlike ops/fused_embed.py (the measured-negative Dense+LN+ReLU+pool fusion,
BENCHNOTES.md "fused-embedding ablation"), the matmul stays under XLA — this
kernel is pure VPU work and cannot lose XLA's latency hiding on the MXU.

Padding contract (same as fused_embed): callers pad bags in whole 16-patch
regions; fully-padded regions produce garbage here and are zeroed by the
caller's region mask. For real (fully-valid) regions the plain 16-row mean
equals the reference's masked mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .attention import _HAS_PALLAS

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

S2 = 16          # patches per region (4x4)
BLK_ROWS = 1024  # patch rows per grid step at D<=384 (multiple of S2)
LN_EPS = 1e-6    # flax LayerNorm default

# scoped VMEM is 16 MB; keep each block's working set (in+out+f32 temps,
# double-buffered) under ~10 MB by shrinking rows as the feature dim grows
_BLK_BUDGET = BLK_ROWS * 384


_BLK_OVERRIDE = None  # scripts/bench_lnpool.py block-size sweep hook


def set_lnpool_block_rows(rows):
    """Override the per-grid-step row-block size (None = auto). Rows are
    clamped to a multiple of 16; used by the kernel block-size sweep."""
    global _BLK_OVERRIDE
    _BLK_OVERRIDE = None if rows is None else max(S2, int(rows) // S2 * S2)


def _blk_rows(D: int) -> int:
    if _BLK_OVERRIDE is not None:
        return _BLK_OVERRIDE
    return max(S2, min(BLK_ROWS, (_BLK_BUDGET // D) // S2 * S2))


def _stats(h):
    """LN stats in f32 (matches flax's f32 stat computation under bf16)."""
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    return (h - mu) * inv, inv


def _fwd_kernel(h_ref, sc_ref, bi_ref, o_ref):
    h = h_ref[:].astype(jnp.float32)
    xhat, _ = _stats(h)
    y = jnp.maximum(xhat * sc_ref[:] + bi_ref[:], 0.0)
    o_ref[:] = jnp.mean(y.reshape(h.shape[0] // S2, S2, -1), axis=1).astype(o_ref.dtype)


def _bwd_kernel(g_ref, h_ref, sc_ref, bi_ref, dh_ref, dsc_ref, dbi_ref,
                dsc_scr, dbi_scr):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dsc_scr[:] = jnp.zeros_like(dsc_scr)
        dbi_scr[:] = jnp.zeros_like(dbi_scr)

    h = h_ref[:].astype(jnp.float32)
    xhat, inv = _stats(h)
    scale = sc_ref[:]
    relu_on = (xhat * scale + bi_ref[:]) > 0.0
    g = g_ref[:].astype(jnp.float32) / S2                     # mean backward
    g_rows = jnp.broadcast_to(g[:, None, :], (g.shape[0], S2, g.shape[1]))
    g_rows = g_rows.reshape(g.shape[0] * S2, g.shape[1])      # [blk, D]
    gy = jnp.where(relu_on, g_rows, 0.0)                      # relu backward
    gx = gy * scale
    m1 = jnp.mean(gx, axis=-1, keepdims=True)
    m2 = jnp.mean(gx * xhat, axis=-1, keepdims=True)
    dh_ref[:] = (inv * (gx - m1 - xhat * m2)).astype(dh_ref.dtype)
    dsc_scr[:] += jnp.sum(gy * xhat, axis=0, keepdims=True)
    dbi_scr[:] += jnp.sum(gy, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _emit():
        dsc_ref[:] = dsc_scr[:].astype(dsc_ref.dtype)
        dbi_ref[:] = dbi_scr[:].astype(dbi_ref.dtype)


def _pad_rows(x, m):
    pad = (-x.shape[0]) % m
    return (jnp.pad(x, ((0, pad), (0, 0))) if pad else x), x.shape[0]


@jax.custom_vjp
def ln_relu_region_mean(h, scale, bias):
    """[M, D] pre-LN rows -> [M/16, D] pooled regions (M % 16 == 0).

    mean(relu(LayerNorm(h)), 16-row groups); D must be a lane multiple (128).
    """
    return _fwd_impl(h, scale, bias)


def _fwd_impl(h, scale, bias):
    M, D = h.shape
    assert M % S2 == 0 and D % 128 == 0, (M, D)
    blk = _blk_rows(D)
    hp, M0 = _pad_rows(h, blk)
    grid = (hp.shape[0] // blk,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk // S2, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp.shape[0] // S2, D), h.dtype),
    )(hp, scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return out[: M0 // S2]


def _fwd_rule(h, scale, bias):
    return _fwd_impl(h, scale, bias), (h, scale, bias)


def _bwd_rule(res, g):
    h, scale, bias = res
    M, D = h.shape
    blk = _blk_rows(D)
    hp, M0 = _pad_rows(h, blk)
    gp, _ = _pad_rows(g.astype(jnp.float32), blk // S2)
    grid = (hp.shape[0] // blk,)
    dh, dsc, dbi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk // S2, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hp.shape[0], D), h.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )(gp, hp, scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return (dh[:M0], dsc.reshape(-1).astype(scale.dtype),
            dbi.reshape(-1).astype(bias.dtype))


ln_relu_region_mean.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Plain fused LayerNorm -> ReLU (no pool). Built for the GENConv MLP norm
# ([N, 2C]) and DeepGCNBlock norm ([N, C]) chains in PatchGCN (reference:
# torch_geometric MLP norm='layer' + DeepGCNLayer norm,
# model/backbone.py:139-142) — but measured SLOWER there end-to-end
# (789 vs 848 bags/s; BENCHNOTES "plain LN+ReLU fusion in GENConv"): XLA
# fuses those chains with the latency-bound MLP matmuls, and without a pooled
# (16x smaller) output the kernel's 2-pass traffic has no structural edge.
# Kept as a tested, measured negative result (like ops/fused_embed.py); wins
# standalone on large activations but is wired into no shipped model.
# ---------------------------------------------------------------------------


def _lnrelu_fwd_kernel(h_ref, sc_ref, bi_ref, y_ref):
    h = h_ref[:].astype(jnp.float32)
    xhat, _ = _stats(h)
    y_ref[:] = jnp.maximum(xhat * sc_ref[:] + bi_ref[:], 0.0).astype(y_ref.dtype)


def _lnrelu_bwd_kernel(g_ref, h_ref, sc_ref, bi_ref, dh_ref, dsc_ref, dbi_ref,
                       dsc_scr, dbi_scr):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dsc_scr[:] = jnp.zeros_like(dsc_scr)
        dbi_scr[:] = jnp.zeros_like(dbi_scr)

    h = h_ref[:].astype(jnp.float32)
    xhat, inv = _stats(h)
    scale = sc_ref[:]
    relu_on = (xhat * scale + bi_ref[:]) > 0.0
    gy = jnp.where(relu_on, g_ref[:].astype(jnp.float32), 0.0)
    gx = gy * scale
    m1 = jnp.mean(gx, axis=-1, keepdims=True)
    m2 = jnp.mean(gx * xhat, axis=-1, keepdims=True)
    dh_ref[:] = (inv * (gx - m1 - xhat * m2)).astype(dh_ref.dtype)
    dsc_scr[:] += jnp.sum(gy * xhat, axis=0, keepdims=True)
    dbi_scr[:] += jnp.sum(gy, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _emit():
        dsc_ref[:] = dsc_scr[:].astype(dsc_ref.dtype)
        dbi_ref[:] = dbi_scr[:].astype(dbi_ref.dtype)


@jax.custom_vjp
def ln_relu(h, scale, bias):
    """relu(LayerNorm(h)) over the last axis of [M, D]; D % 128 == 0."""
    return _lnrelu_fwd_impl(h, scale, bias)


def _lnrelu_fwd_impl(h, scale, bias):
    M, D = h.shape
    assert D % 128 == 0, (M, D)
    blk = _blk_rows(D)
    hp, M0 = _pad_rows(h, blk)
    grid = (hp.shape[0] // blk,)
    y = pl.pallas_call(
        _lnrelu_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(hp.shape, h.dtype),
    )(hp, scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return y[:M0]


def _lnrelu_fwd_rule(h, scale, bias):
    return _lnrelu_fwd_impl(h, scale, bias), (h, scale, bias)


def _lnrelu_bwd_rule(res, g):
    h, scale, bias = res
    D = h.shape[1]
    blk = _blk_rows(D)
    hp, M0 = _pad_rows(h, blk)
    # keep g in its own (storage) dtype: an f32 upcast would double the
    # backward's dominant HBM read at these full-size cotangents
    gp, _ = _pad_rows(g, blk)
    grid = (hp.shape[0] // blk,)
    dh, dsc, dbi = pl.pallas_call(
        _lnrelu_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(hp.shape, h.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )(gp, hp, scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return (dh[:M0], dsc.reshape(-1).astype(scale.dtype),
            dbi.reshape(-1).astype(bias.dtype))


ln_relu.defvjp(_lnrelu_fwd_rule, _lnrelu_bwd_rule)


def reference_ln_relu(h, scale, bias):
    """Unfused jnp path (test oracle and CPU fallback); f32 math like flax."""
    hf = h.astype(jnp.float32)
    xhat, _ = _stats(hf)
    return jnp.maximum(xhat * scale.astype(jnp.float32)
                       + bias.astype(jnp.float32), 0.0).astype(h.dtype)


def reference_ln_relu_region_mean(h, scale, bias):
    """Unfused jnp path (test oracle and CPU fallback); f32 math like flax."""
    hf = h.astype(jnp.float32)
    xhat, _ = _stats(hf)
    y = jnp.maximum(xhat * scale.astype(jnp.float32)
                    + bias.astype(jnp.float32), 0.0)
    M, D = y.shape
    return jnp.mean(y.reshape(M // S2, S2, D), axis=1).astype(h.dtype)
