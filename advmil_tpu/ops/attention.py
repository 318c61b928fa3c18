"""Masked flash attention (fwd + bwd) as Pallas TPU kernels.

Used by the ESAT/DualTrans transformer encoder (reference
model/backbone_utils.py:113-127 wraps torch's cuDNN attention). Bags reach
tens of thousands of patches -> thousands of regions; materializing the
[B, H, L, L] logits in HBM is the memory bottleneck, so the kernels stream
K/V blocks with an online softmax, keeping only [BLK_Q, BLK_K] tiles in VMEM.

The op is differentiable via `jax.custom_vjp`: the forward kernel saves the
per-row logsumexp, and two recompute-based backward kernels produce dQ and
(dK, dV) without ever materializing the [L, L] probabilities in HBM
(FlashAttention-2 backward structure).

Attention-probability dropout (torch MultiheadAttention semantics: applied
to the softmaxed weights, scaled by 1/(1-p)) is implemented *inside* the
kernels with the TPU core PRNG: each [BLK_Q, BLK_K] tile derives its keep
mask from `prng_seed(seed, batch_head, q_block, k_block)`, so the forward
and both backward kernels regenerate bit-identical masks without storing
them. The PRNG primitives lower only on real TPUs (interpret mode raises
NotImplementedError), so dropout_p > 0 requires hardware; dropout_p == 0
paths trace no PRNG ops and run fine in interpret mode.

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


def flash_force_interpret() -> bool:
    """Test hook: ADVMIL_FLASH_INTERPRET=1 runs the FLASH kernels (only) in
    Pallas interpret mode on any backend, so the attention dispatch/sharding
    plumbing (incl. the shard_map'd instance-parallel wrapper) is exercisable
    on the virtual CPU mesh. Deliberately scoped to this module — the other
    Pallas ops (ln_pool, banded, segment) gate on pallas_available() and have
    no interpret plumbing. dropout_p > 0 still requires real hardware (the
    TPU core PRNG has no interpret lowering)."""
    import os
    return _HAS_PALLAS and os.environ.get("ADVMIL_FLASH_INTERPRET") == "1"


def pallas_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dropout_keep(seed_ref, b, i, j, shape, dropout_p):
    """Regenerable per-tile keep mask (f32 0/1) from the TPU core PRNG.

    Seeded by (user seed, tile id) so the forward and both backward kernels —
    whose grids enumerate the same logical (batch*head, q-block, k-block)
    tiles in different orders — observe identical bits. The tile coordinates
    are packed into one int32 because the TPU PRNG accepts at most two seed
    words (bounds: q/k block index < 1024, batch*head < 2048 — far above any
    real bag/batch here).
    """
    tile = b * 1048576 + i * 1024 + j
    pltpu.prng_seed(seed_ref[0], tile)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(dropout_p * 4294967296.0), 4294967295))
    return (bits >= thresh).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref,
                      o_ref, lse_ref, m_scr, l_scr, acc_scr,
                      *, nk: int, blk_q: int, blk_k: int, dropout_p: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
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
    # the softmax denominator uses the *undropped* weights (torch applies
    # dropout after normalization); dropout only rescales the V contraction
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
    if dropout_p > 0.0:
        keep = _dropout_keep(seed_ref, b, i, j, (blk_q, blk_k), dropout_p)
        p_use = p * keep * (1.0 / (1.0 - dropout_p))
    else:
        p_use = p
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p_use, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:, 0] = m_cur

    @pl.when(j == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:, 0], 1e-30)
        o_ref[:] = (acc_scr[:] / denom[:, None]).astype(o_ref.dtype)
        lse_ref[pl.ds(b, 1), pl.ds(i * blk_q, blk_q)] = (
            m_scr[:, 0] + jnp.log(denom))[None, :]


# ---------------------------------------------------------------------------
# backward: dQ  (grid = (BH, nq, nk), accumulate over key blocks)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(qs_ref, k_ref, v_ref, do_ref, mask_ref, lse_ref,
                         dvec_ref, seed_ref, dq_ref, acc_scr,
                         *, nk: int, blk_q: int, blk_k: int, dropout_p: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qs = qs_ref[:]                    # [BLK_Q, D] (pre-scaled)
    k = k_ref[:]                      # [BLK_K, D]
    v = v_ref[:]                      # [BLK_K, D]
    do = do_ref[:]                    # [BLK_Q, D]
    msk = mask_ref[b, pl.ds(j * blk_k, blk_k)]     # [BLK_K]
    lse = lse_ref[b, pl.ds(i * blk_q, blk_q)]      # [BLK_Q]
    dvec = dvec_ref[b, pl.ds(i * blk_q, blk_q)]    # [BLK_Q] rowsum(dO*O)

    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # recompute normalized probs against the saved logsumexp; masked columns
    # are selected (not multiplied) to zero — for fully-masked rows lse is the
    # huge-negative denominator clamp and exp overflows to inf, so a plain
    # mask multiply would produce inf * 0 = NaN
    p = jnp.where(msk[None, :] > 0, jnp.exp(s - lse[:, None]), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        keep = _dropout_keep(seed_ref, b, i, j, (blk_q, blk_k), dropout_p)
        dp = dp * keep * (1.0 / (1.0 - dropout_p))
    ds_ = p * (dp - dvec[:, None])
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        ds_, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[:] = acc_scr[:].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward: dK, dV  (grid = (BH, nk, nq), accumulate over query blocks)
# ---------------------------------------------------------------------------

def _flash_bwd_dkv_kernel(qs_ref, do_ref, k_ref, v_ref, mask_ref, lse_ref,
                          dvec_ref, seed_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                          *, nq: int, blk_q: int, blk_k: int, dropout_p: float):
    b = pl.program_id(0)
    jk = pl.program_id(1)
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qs = qs_ref[:]                    # [BLK_Q, D] (pre-scaled)
    do = do_ref[:]                    # [BLK_Q, D]
    k = k_ref[:]                      # [BLK_K, D]
    v = v_ref[:]                      # [BLK_K, D]
    msk = mask_ref[b, pl.ds(jk * blk_k, blk_k)]    # [BLK_K]
    lse = lse_ref[b, pl.ds(iq * blk_q, blk_q)]     # [BLK_Q]
    dvec = dvec_ref[b, pl.ds(iq * blk_q, blk_q)]   # [BLK_Q]

    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # where-select, not mask-multiply: see the dQ kernel note on inf * 0
    p = jnp.where(msk[None, :] > 0, jnp.exp(s - lse[:, None]), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_p > 0.0:
        # seed args ordered (b, q-block, k-block) exactly as in the forward /
        # dQ grids so the regenerated tile matches bit-for-bit
        keep = _dropout_keep(seed_ref, b, iq, jk, (blk_q, blk_k), dropout_p)
        inv = 1.0 / (1.0 - dropout_p)
        pt = p * keep * inv           # dropped probs: dV sees what O saw
        dp = dp * keep * inv
    else:
        pt = p
    ds_ = p * (dp - dvec[:, None])
    # dV_j += P~^T dO ; dK_j += dS^T (scale*Q)   (scale lives in qs already)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        pt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds_, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# folding helpers + pallas_call wrappers
# ---------------------------------------------------------------------------

def _fold(x, B, L, H, Dh, Lp, Dp):
    """[B, L, H, Dh] -> [B*H*Lp, Dp] zero-padded, head-major rows."""
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, L, Dh)
    x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, Dp - Dh)))
    return x.reshape(B * H * Lp, Dp)

def _unfold(x2, B, L, H, Dh, Lp, Dp):
    """[B*H*Lp, Dp] -> [B, L, H, Dh]."""
    x = x2.reshape(B * H, Lp, Dp)[:, :L, :Dh]
    return x.reshape(B, H, L, Dh).transpose(0, 2, 1, 3)


def _fwd_call(cfg, q, k, v, mask, seed):
    dropout_p, blk_q, blk_k, interpret = cfg
    B, Lq, H, Dh = q.shape
    Lk = k.shape[1]              # Lk may differ from Lq (sequence-parallel
    scale = 1.0 / (Dh ** 0.5)    # wrapper: local Q rows vs all-gathered K/V)
    Dp = _round_up(Dh, 128)
    Lqp = _round_up(Lq, blk_q)
    Lkp = _round_up(Lk, blk_k)
    qf2 = _fold(q * scale, B, Lq, H, Dh, Lqp, Dp)
    kf2 = _fold(k, B, Lk, H, Dh, Lkp, Dp)
    vf2 = _fold(v, B, Lk, H, Dh, Lkp, Dp)
    mk = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, Lkp - Lk)))
    mk = jnp.repeat(mk, H, axis=0)    # [B*H, Lkp]
    nq = Lqp // blk_q
    nk = Lkp // blk_k
    BH = B * H

    out2, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, nk=nk, blk_q=blk_q, blk_k=blk_k,
                          dropout_p=dropout_p),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * nk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * nk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full [BH, Lkp] key mask
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed [1]
        ],
        out_specs=[
            pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full [BH, Lqp] logsumexp
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH * Lqp, Dp), q.dtype),
            jax.ShapeDtypeStruct((BH, Lqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qf2, kf2, vf2, mk, seed)
    out = _unfold(out2, B, Lq, H, Dh, Lqp, Dp)
    return out, lse


def _bwd_call(cfg, res, do):
    dropout_p, blk_q, blk_k, interpret = cfg
    q, k, v, mask, seed, out, lse = res
    B, Lq, H, Dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)
    Dp = _round_up(Dh, 128)
    Lqp = _round_up(Lq, blk_q)
    Lkp = _round_up(Lk, blk_k)
    nq = Lqp // blk_q
    nk = Lkp // blk_k
    BH = B * H

    qs2 = _fold(q * scale, B, Lq, H, Dh, Lqp, Dp)
    kf2 = _fold(k, B, Lk, H, Dh, Lkp, Dp)
    vf2 = _fold(v, B, Lk, H, Dh, Lkp, Dp)
    do2 = _fold(do, B, Lq, H, Dh, Lqp, Dp)
    mk = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, Lkp - Lk)))
    mk = jnp.repeat(mk, H, axis=0)
    # D_i = rowsum(dO * O): identical with and without dropout (the dropped
    # probs cancel in the softmax-backward inner product)
    dvec = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dvec = jnp.transpose(dvec, (0, 2, 1)).reshape(BH, Lq)
    dvec = jnp.pad(dvec, ((0, 0), (0, Lqp - Lq)))

    dq2 = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, nk=nk, blk_q=blk_q,
                          blk_k=blk_k, dropout_p=dropout_p),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * nk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, i, j: (b * nk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * nq + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask [BH, Lkp]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lse  [BH, Lqp]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dvec [BH, Lqp]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed [1]
        ],
        out_specs=pl.BlockSpec((blk_q, Dp), lambda b, i, j: (b * nq + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH * Lqp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk_q, Dp), jnp.float32)],
        interpret=interpret,
    )(qs2, kf2, vf2, do2, mk, lse, dvec, seed)

    dk2, dv2 = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, nq=nq, blk_q=blk_q,
                          blk_k=blk_k, dropout_p=dropout_p),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((blk_q, Dp), lambda b, jk, iq: (b * nq + iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_q, Dp), lambda b, jk, iq: (b * nq + iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, jk, iq: (b * nk + jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, jk, iq: (b * nk + jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dvec
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        ],
        out_specs=[
            pl.BlockSpec((blk_k, Dp), lambda b, jk, iq: (b * nk + jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, Dp), lambda b, jk, iq: (b * nk + jk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH * Lkp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((BH * Lkp, Dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_k, Dp), jnp.float32),
            pltpu.VMEM((blk_k, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qs2, do2, kf2, vf2, mk, lse, dvec, seed)

    dq = _unfold(dq2, B, Lq, H, Dh, Lqp, Dp) * scale
    dk = _unfold(dk2, B, Lk, H, Dh, Lkp, Dp)
    dv = _unfold(dv2, B, Lk, H, Dh, Lkp, Dp)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(cfg, q, k, v, mask, seed):
    out, _ = _fwd_call(cfg, q, k, v, mask, seed)
    return out

def _flash_fwd_rule(cfg, q, k, v, mask, seed):
    out, lse = _fwd_call(cfg, q, k, v, mask, seed)
    return out, (q, k, v, mask, seed, out, lse)

def _flash_bwd_rule(cfg, res, do):
    dq, dk, dv = _bwd_call(cfg, res, do)
    mask, seed = res[3], res[4]
    import numpy as np
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(mask), dseed

_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _auto_block(L: int) -> int:
    """Largest tile that keeps VMEM modest and padding minimal: the measured
    per-unit-work rate improves ~3x from 256 to 1024 tiles (fewer grid cells,
    fewer Q reloads), so use one tile per 256-granule sequence up to 1024."""
    return min(1024, _round_up(L, 256))


def masked_flash_attention(q, k, v, mask, blk_q: int = 0, blk_k: int = 0,
                           interpret: bool = False, *, dropout_p: float = 0.0,
                           seed=None):
    """Softmax(QK^T / sqrt(Dh)) V with a key-padding mask, O(L) memory.

    q: [B, Lq, H, Dh]; k, v: [B, Lk, H, Dh]; mask: [B, Lk] (1 = real key).
    Lq may differ from Lk (the sequence-parallel wrapper feeds local query
    rows against all-gathered keys). Fully-masked queries (padding rows /
    dummy bags) return zeros. Differentiable (custom VJP, recompute-based
    flash backward). Output matches the einsum reference path to f32
    accuracy. blk_q/blk_k 0 = auto (see _auto_block).

    dropout_p > 0 applies attention-probability dropout inside the kernels
    (requires a real TPU; the core-PRNG primitives have no interpret-mode
    lowering). `seed` is a [1] int32 array; the same seed reproduces the same
    dropout mask in forward and backward.
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    interpret = interpret or flash_force_interpret()
    Lq, Lk = q.shape[1], k.shape[1]
    blk_q = blk_q or _auto_block(Lq)
    blk_k = blk_k or _auto_block(Lk)
    if dropout_p > 0.0:
        # the per-tile PRNG seed packs (batch*head, q-block, k-block) into one
        # int32 (_dropout_keep); enforce the packing bounds loudly instead of
        # silently aliasing dropout masks across tiles
        BH = q.shape[0] * q.shape[2]
        nq, nk = -(-Lq // blk_q), -(-Lk // blk_k)
        if BH >= 2048 or nq >= 1024 or nk >= 1024:
            raise ValueError(
                f"dropout tile-id packing bounds exceeded: batch*heads={BH} "
                f"(<2048), q-blocks={nq}, k-blocks={nk} (<1024); shrink the "
                f"batch or raise blk_q/blk_k")
    cfg = (float(dropout_p), int(blk_q), int(blk_k), bool(interpret))
    return _flash(cfg, q, k, v, mask.astype(jnp.float32), seed)


def masked_flash_attention_inst(q, k, v, mask, mesh, *, dropout_p: float = 0.0,
                                seed=None, data_axis: str = "data",
                                inst_axis: str = "inst",
                                interpret: bool = False):
    """Sequence-parallel flash attention over a 2-D (data x inst) mesh.

    Composes the Pallas kernel with instance (sequence) sharding instead of
    forfeiting it (round-3 gate: `effective_flash_min_len` pushed flash out
    of reach whenever inst_devices > 1, because the kernel has no GSPMD
    partitioning rule and XLA would replicate it whole). shard_map makes the
    partitioning explicit: each inst rank keeps its LOCAL query rows, the
    K/V/mask operands are all-gathered over the inst axis (riding ICI), and
    the kernel runs on [B/dp, L/ip, H, Dh] queries against full keys — the
    same decomposition as ring attention's fully-unrolled variant, chosen
    because L here is the region count (a few thousand), so full K/V easily
    fits VMEM-adjacent HBM. The backward needs no custom code: shard_map
    differentiates through, and the all-gather's transpose is exactly the
    psum_scatter that reduces the per-rank partial dK/dV.

    q,k,v: [B, L, H, Dh] GLOBAL shapes, batch sharded over `data_axis`,
    L sharded over `inst_axis`; mask: [B, L]. Output sharded like q.

    In-kernel dropout stays available: each inst rank perturbs the seed with
    its axis index so keep-mask tiles decorrelate across ranks (forward and
    backward regenerate identically — the perturbed seed is part of the
    residuals).
    """
    from jax.sharding import PartitionSpec as P

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    spec_qkv = P(data_axis, inst_axis, None, None)
    spec_mask = P(data_axis, inst_axis)

    def local(ql, kl, vl, ml, sl):
        kf = jax.lax.all_gather(kl, inst_axis, axis=1, tiled=True)
        vf = jax.lax.all_gather(vl, inst_axis, axis=1, tiled=True)
        mf = jax.lax.all_gather(ml, inst_axis, axis=1, tiled=True)
        sl = sl + jax.lax.axis_index(inst_axis).astype(jnp.int32) * 7919
        return masked_flash_attention(ql, kf, vf, mf, dropout_p=dropout_p,
                                      seed=sl, interpret=interpret)

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask,
                                   P()),
                         out_specs=spec_qkv, check_vma=False)(
        q, k, v, mask.astype(jnp.float32), seed)


def _keep_mask_kernel(seed_ref, o_ref, *, blk_q, blk_k, dropout_p):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    o_ref[:] = _dropout_keep(seed_ref, b, i, j, (blk_q, blk_k), dropout_p)


def dropout_keep_mask_oracle(seed, BH: int, Lp: int, dropout_p: float,
                             blk_q: int = 0, blk_k: int = 0):
    """Materialize the exact [BH, Lp, Lp] keep mask the attention kernels
    derive from (seed, tile) — validation/debug only (O(L^2) memory, real
    TPU only). Lets tests compare the dropout path against a materializing
    einsum oracle bit-for-bit instead of statistically. blk_q/blk_k 0 = the
    same _auto_block sizing masked_flash_attention defaults to — pass them
    explicitly ONLY if the kernel call did."""
    blk_q = blk_q or _auto_block(Lp)
    blk_k = blk_k or _auto_block(Lp)
    nq, nk = Lp // blk_q, Lp // blk_k
    out = pl.pallas_call(
        functools.partial(_keep_mask_kernel, blk_q=blk_q, blk_k=blk_k,
                          dropout_p=dropout_p),
        grid=(BH, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((blk_q, blk_k),
                               lambda b, i, j: (b * (Lp // blk_q) + i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH * Lp, Lp), jnp.float32),
    )(seed)
    return out.reshape(BH, Lp, Lp)


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
