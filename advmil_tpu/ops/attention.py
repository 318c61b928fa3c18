"""Masked flash attention as a Pallas TPU kernel.

Used by the ESAT/DualTrans transformer encoder (reference
model/backbone_utils.py:113-127 wraps torch's cuDNN attention). Bags reach
tens of thousands of patches -> thousands of regions; materializing the
[B, H, L, L] logits in HBM is the memory bottleneck, so the kernel streams
K/V blocks with an online softmax, keeping only [BLK_Q, BLK_K] tiles in VMEM.

Layout: heads are folded into the batch/grid dimension; the head dim is
zero-padded to the 128-lane width (zero K columns don't change logits, zero V
columns are sliced away), so the MXU sees aligned (BLK, 128) tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_NEG_BIG = -1e30


def pallas_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, nk: int, blk_k: int):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]                      # [BLK_Q, D] (pre-scaled)
    k = k_ref[:]                      # [BLK_K, D]
    v = v_ref[:]                      # [BLK_K, D]
    # mask_ref holds the full [BH, Lp] key mask in VMEM (tiny); slice the
    # current batch-head row / key block (a blocked (1, BLK_K) spec violates
    # the TPU (8, 128) tile minimum)
    msk = mask_ref[b, pl.ds(j * blk_k, blk_k)]   # [BLK_K]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(msk[None, :] > 0, s, _NEG_BIG)

    m_prev = m_scr[:, 0]              # [BLK_Q]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None]) * (msk[None, :] > 0)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:, 0] = m_cur

    @pl.when(j == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0], 1e-30)
        o_ref[:] = (acc_scr[:] / denom[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def masked_flash_attention(q, k, v, mask, blk_q: int = 256, blk_k: int = 256,
                           interpret: bool = False):
    """Softmax(QK^T / sqrt(Dh)) V with a key-padding mask, O(L) memory.

    q, k, v: [B, L, H, Dh]; mask: [B, L] (1 = real key). Fully-masked queries
    (padding rows / dummy bags) return zeros. Output matches the einsum
    reference path to f32 accuracy.
    """
    B, L, H, Dh = q.shape
    scale = 1.0 / (Dh ** 0.5)
    Dp = _round_up(Dh, 128)
    Lp = _round_up(L, max(blk_q, blk_k))

    def fold(x):  # [B, L, H, Dh] -> [B*H, Lp, Dp]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, L, Dh)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, Dp - Dh)))

    qf = fold(q * scale)
    kf = fold(k)
    vf = fold(v)
    # per-(batch*head) key mask, padded keys masked out
    mk = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, Lp - L)))
    mk = jnp.repeat(mk, H, axis=0)    # [B*H, Lp]

    nq = Lp // blk_q
    nk = Lp // blk_k
    BH = B * H

    qf2 = qf.reshape(BH * Lp, Dp)
    kf2 = kf.reshape(BH * Lp, Dp)
    vf2 = vf.reshape(BH * Lp, Dp)

    grid = (BH, nq, nk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, nk=nk, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * (Lp // blk_q) + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * (Lp // blk_k) + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * (Lp // blk_k) + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full [BH, Lp] key mask
        ],
        out_specs=pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * (Lp // blk_q) + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH * Lp, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qf2, kf2, vf2, mk)

    out = out.reshape(BH, Lp, Dp)[:, :L, :Dh]
    out = out.reshape(B, H, L, Dh).transpose(0, 2, 1, 3)
    return out


def masked_attention_reference(q, k, v, mask):
    """jnp reference path (materializes logits); used for small L and tests."""
    B, L, H, Dh = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * mask[:, None, None, :].astype(probs.dtype)  # dummy bags -> 0
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
