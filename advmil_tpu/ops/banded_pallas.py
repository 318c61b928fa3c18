"""Pallas TPU kernel for the banded graph softmax aggregation.

The jnp banded path (ops/segment.banded_knn_softmax_aggregate) replaces the
message gather with ~epn rolled copies of the node features, but XLA
materializes every roll in HBM — ~25-30 [N, C] array passes per fwd+bwd
(BENCHNOTES round-3 ablation).  This kernel is the speed-of-light version
sketched there: each grid step holds one node block plus its two neighbor
blocks in VMEM, builds every per-slot "rolled" tile with a VMEM dynamic
slice (zero HBM traffic), and runs the whole masked channel-wise softmax
chain in registers — HBM sees y once in, (out, m, denom) once out.

Residual (non-banded) edges are NOT handled here.  The wrapper recomputes
the few residual-affected rows exactly with the small-gather oracle and
overwrites them, so the combined result equals
``knn_edge_softmax_aggregate`` on the full edge table (up to summation
order), like the jnp banded path.

Reference counterpart: torch_geometric's fused CUDA scatter-softmax used by
GENConv (reference model/backbone.py:139); this is its TPU-native analogue
for raster-ordered spatial kNN graphs (tools/build_graphs.py).

Contract: every |offset| must be < the block size (``_band_block``); the
batcher's construction-time pre-scan guarantees it before enabling the
banded path (data/bags.py), and the wrapper asserts the static bound that
it can (N <= BN implies offsets fit trivially).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard mirrors ops/attention.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .segment import knn_edge_softmax_aggregate

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _band_block(N: int) -> int:
    """Node-block rows: 128 keeps the backward's five [3*bn, C] concats plus
    double-buffered blocks within the 16 MB VMEM budget at C=384, and admits
    band offsets up to +-128 (slide raster width <= 127 — the batcher
    pre-scan falls back to the jnp rolls path beyond that)."""
    return min(128, _round_up(max(N, 8), 8))


def _concat3(dst, a, b, c, bn):
    dst[0:bn] = a[...].astype(dst.dtype)
    dst[bn:2 * bn] = b[...].astype(dst.dtype)
    dst[2 * bn:3 * bn] = c[...].astype(dst.dtype)


def _rows_at(ref, start, bn, interpret):
    """rows [start, start + bn) of a [3*bn + 8, C] concat REF, for a DYNAMIC
    start in [0, 2*bn].

    Mosaic cannot prove a dynamic sublane slice start is 8-aligned, and a
    full dynamic rotate (pltpu.roll) measured ~5x the cost of the whole
    kernel. Instead: an 8-ALIGNED dynamic slice (pl.multiple_of hint — pure
    addressing, no data movement) over bn + 8 rows, then the residual
    rotate r in [0, 8) as three conditional static rotates (the binary
    decomposition of r) — ~3 cheap register passes instead of a barrel
    shift over 3*bn rows. The concat scratches carry 8 slack rows so the
    aligned tile never reads out of bounds.
    """
    if interpret:
        return jax.lax.dynamic_slice_in_dim(ref[...], start, bn, axis=0)
    a8 = (start // 8) * 8
    r = start - a8
    tile = ref[pl.ds(pl.multiple_of(a8, 8), bn + 8)]
    for k in (4, 2, 1):
        rot = jnp.concatenate([tile[k:], tile[:k]], axis=0)
        tile = jnp.where((r & k) != 0, rot, tile)
    return tile[0:bn]


def _banded_fwd_kernel(offs_ref, t_ref, bm_ref, yp_ref, yc_ref, yn_ref,
                       out_ref, m_ref, den_ref, ys_ref, *, epn, bn,
                       save_stats, interpret):
    """One node block: out = banded masked channel-wise softmax aggregation.

    ys_ref (VMEM scratch, [3*bn, C] f32) holds [prev | cur | next] blocks;
    the slot-s "roll" is ys_ref[bn + offs[s] : 2*bn + offs[s]].  Rows whose
    banded target falls outside the bag were routed to the residual list by
    build_band_tables, so their band_mask is 0 and any garbage the clamped
    neighbor blocks supply never contributes.
    """
    _concat3(ys_ref, yp_ref, yc_ref, yn_ref, bn)
    t = t_ref[0, 0]
    rolls = [_rows_at(ys_ref, bn + offs_ref[0, s], bn, interpret)
             for s in range(epn)]
    m = jnp.full(out_ref.shape, NEG, jnp.float32)
    for s in range(epn):
        mb = bm_ref[:, s:s + 1] > 0
        m = jnp.maximum(m, jnp.where(mb, rolls[s] * t, NEG))
    m = jnp.where(m <= -1e29, 0.0, m)  # no-edge rows -> exp(junk - 0) * 0
    den = jnp.zeros(out_ref.shape, jnp.float32)
    num = jnp.zeros(out_ref.shape, jnp.float32)
    for s in range(epn):
        mb = bm_ref[:, s:s + 1] > 0
        # where-select BEFORE exp (NaN-free like the jnp oracle paths)
        ex = jnp.where(mb, jnp.exp(rolls[s] * t - m), 0.0)
        den = den + ex
        num = num + ex * rolls[s]
    out_ref[...] = (num / jnp.maximum(den, 1e-16)).astype(out_ref.dtype)
    if save_stats:
        m_ref[...] = m
        den_ref[...] = den


def _banded_bwd_kernel(offs_ref, t_ref, yc_ref,
                       bm0, bm1, bm2, g0, g1, g2, m0, m1, m2,
                       d0, d1, d2, o0, o1, o2,
                       dy_ref, dt_ref, sbm, sm, sg1, sg2, *, epn, bn,
                       interpret):
    """dy block for rows r: out[n] consumed y[n + o_s], so dy[r] collects
    from source rows n = r - o_s.  y itself is only ever needed at row r
    (y[n + o_s] == y[r]) — the current block.  With alpha_s[n] =
    bm[n,s] * exp(y[r]*t - m[n]) / den[n]:

      dy[r] += g[n] * alpha_s[n] * (1 + t * (y[r] - out[n]))
             = bm * e_term * (G1[n] * (1 + t*y[r]) - t * G2[n])
      dt    += g[n] * alpha_s[n] * y[r] * (y[r] - out[n])
             = bm * e_term * y[r] * (G1[n] * y[r] - G2[n])

    where e_term = exp(y[r]*t - m[n]), G1 = g/den and G2 = g*out/den are
    PRECOMBINED per source row — so only three [*, C] concats (m, G1, G2)
    plus the thin mask need the shifted read, instead of five.  Each (n, s)
    pair lands in exactly one r block (r = n + o_s is a bijection per
    slot), so summing dt block-partials is exact.
    """
    _concat3(sbm, bm0, bm1, bm2, bn)
    _concat3(sm, m0, m1, m2, bn)
    for pos, (gi, di, oi) in enumerate(((g0, d0, o0), (g1, d1, o1),
                                        (g2, d2, o2))):
        inv = 1.0 / jnp.maximum(di[...], 1e-16)
        gg = gi[...].astype(jnp.float32) * inv
        sg1[pos * bn:(pos + 1) * bn] = gg
        sg2[pos * bn:(pos + 1) * bn] = gg * oi[...].astype(jnp.float32)
    t = t_ref[0, 0]
    yr = yc_ref[...].astype(jnp.float32)
    dy = jnp.zeros(dy_ref.shape, jnp.float32)
    dt = jnp.float32(0.0)
    for s in range(epn):
        o = offs_ref[0, s]
        start = bn - o  # n = r - o_s in concat coordinates
        mn = _rows_at(sm, start, bn, interpret)
        g1n = _rows_at(sg1, start, bn, interpret)
        g2n = _rows_at(sg2, start, bn, interpret)
        mbn = _rows_at(sbm, start, bn, interpret)[:, s:s + 1] > 0
        e_term = jnp.where(mbn, jnp.exp(yr * t - mn), 0.0)
        dy = dy + e_term * (g1n * (1.0 + t * yr) - t * g2n)
        dt = dt + jnp.sum(e_term * yr * (g1n * yr - g2n))
    dy_ref[...] = dy.astype(dy_ref.dtype)
    # full (8, 128) tile per block (TPU tiling minimum, incl. under vmap);
    # the wrapper sums all entries and divides by the exact 2^10 tile size
    dt_ref[...] = jnp.full((8, 128), dt, jnp.float32)


def _pad_geom(y, band_mask):
    N, C = y.shape
    epn = band_mask.shape[1]
    bn = _band_block(N)
    npad = _round_up(N, bn)
    c_p = _round_up(C, 128)
    epn_p = _round_up(epn, 8)
    yp = jnp.pad(y, ((0, npad - N), (0, c_p - C)))
    bmp = jnp.pad(band_mask, ((0, npad - N), (0, epn_p - epn)))
    return yp, bmp, bn, npad, c_p, epn_p, epn


def _neighbor_specs(bn, c_p, nblocks):
    clamp_lo = lambda i: (jnp.maximum(i - 1, 0), 0)
    cur = lambda i: (i, 0)
    clamp_hi = lambda i: (jnp.minimum(i + 1, nblocks - 1), 0)
    return [pl.BlockSpec((bn, c_p), f, memory_space=pltpu.VMEM)
            for f in (clamp_lo, cur, clamp_hi)]


def _banded_core_fwd(y, offs, band_mask, t, save_stats, interpret):
    yp, bmp, bn, npad, c_p, epn_p, epn = _pad_geom(y, band_mask)
    nblocks = npad // bn
    bm_spec = pl.BlockSpec((bn, epn_p), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((npad, c_p), y.dtype)]
    if save_stats:
        out_shapes += [jax.ShapeDtypeStruct((npad, c_p), jnp.float32),
                       jax.ShapeDtypeStruct((npad, c_p), jnp.float32)]
    if save_stats:
        kernel = functools.partial(_banded_fwd_kernel, epn=epn, bn=bn,
                                   save_stats=True, interpret=interpret)
    else:  # no m/den outputs: keep the ref binding order straight
        def kernel(offs_ref, t_ref, bm_ref, yp_ref, yc_ref, yn_ref,
                   out_ref, ys_ref):
            _banded_fwd_kernel(offs_ref, t_ref, bm_ref, yp_ref, yc_ref,
                               yn_ref, out_ref, None, None, ys_ref,
                               epn=epn, bn=bn, save_stats=False,
                               interpret=interpret)
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),   # offs [epn]
                  pl.BlockSpec(memory_space=pltpu.SMEM),   # t [1, 1]
                  bm_spec] + _neighbor_specs(bn, c_p, nblocks),
        out_specs=[pl.BlockSpec((bn, c_p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * len(out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((3 * bn + 8, c_p), jnp.float32)],
        interpret=interpret,
    )(offs.astype(jnp.int32).reshape(1, -1),
      jnp.asarray(t).reshape(1, 1).astype(jnp.float32),
      bmp.astype(jnp.float32), yp, yp, yp)
    return list(outs), (bn, npad, c_p, epn_p, epn)


def _banded_core_bwd(y, offs, band_mask, t, m, den, out, g, interpret):
    yp, bmp, bn, npad, c_p, epn_p, epn = _pad_geom(y, band_mask)
    nblocks = npad // bn
    gp = jnp.pad(g, ((0, npad - y.shape[0]), (0, c_p - y.shape[1])))
    nspec = lambda: _neighbor_specs(bn, c_p, nblocks)
    # band_mask is zero-padded with one block on each side and read through
    # SHIFTED index maps: wherever the source row n = r - o_s falls outside
    # [0, npad) — where the clamped stat blocks hold a WRONG row's data —
    # the mask itself reads 0, so garbage never contributes. The (larger)
    # stat arrays stay clamped and unpadded; only this small mask is copied.
    bmz = jnp.pad(bmp.astype(jnp.float32), ((bn, bn), (0, 0)))
    bm_specs = [pl.BlockSpec((bn, epn_p), f, memory_space=pltpu.VMEM)
                for f in (lambda i: (i, 0),
                          lambda i: (i + 1, 0),
                          lambda i: (i + 2, 0))]
    dy, dtp = pl.pallas_call(
        functools.partial(_banded_bwd_kernel, epn=epn, bn=bn,
                          interpret=interpret),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((bn, c_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]  # y current block
        + bm_specs + nspec() + nspec() + nspec() + nspec(),
        out_specs=[pl.BlockSpec((bn, c_p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad, c_p), y.dtype),
                   jax.ShapeDtypeStruct((nblocks * 8, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((3 * bn + 8, epn_p), jnp.float32),
                        pltpu.VMEM((3 * bn + 8, c_p), jnp.float32),
                        pltpu.VMEM((3 * bn + 8, c_p), jnp.float32),
                        pltpu.VMEM((3 * bn + 8, c_p), jnp.float32)],
        interpret=interpret,
    )(offs.astype(jnp.int32).reshape(1, -1),
      jnp.asarray(t).reshape(1, 1).astype(jnp.float32),
      yp, bmz, bmz, bmz, gp, gp, gp, m, m, m, den, den, den,
      out, out, out)
    N, C = y.shape
    dt = jnp.sum(dtp) / 1024.0
    return dy[:N, :C], dt


def _exact_rows(y, u_src, u_emask, t):
    """Small-gather oracle over the residual-affected rows' FULL edge sets.
    u_src rows are in-range (sentinel slots carry mask 0), so the gather is
    safe; epn-wide masked softmax matches knn_edge_softmax_aggregate."""
    msg = y[u_src]                       # [U, epn, C]
    return knn_edge_softmax_aggregate(msg, u_emask, t)


def _overwrite_u(out_b, out_u, u_rows, u_inv):
    """Overwrite the residual-affected rows of the banded result with their
    exact recomputation. With the batcher-shipped inverse map ``u_inv``
    (u_inv[r] = slot of row r in u_rows, sentinel U elsewhere) this is a
    pure gather + select; without it, the XLA scatter fallback."""
    if u_inv is None:
        return out_b.at[u_rows].set(out_u, mode="drop")
    U = u_rows.shape[0]
    sel = (u_inv < U)[:, None]
    return jnp.where(sel, out_u[jnp.clip(u_inv, 0, U - 1)], out_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def pallas_banded_aggregate(y, offs, band_mask, u_rows, u_src, u_emask, t,
                            u_inv=None, interpret=False):
    """Banded softmax aggregation == knn_edge_softmax_aggregate on the full
    dense edge table, evaluated as (Pallas banded kernel) + (exact
    recomputation of the residual-affected rows, overwritten on top).

    y: [N, C] per-source messages (relu(x) + eps); offs: [epn] int32
    per-slot modal offsets; band_mask: [N, epn] 1 = edge present AND banded;
    u_rows: [U] int32 rows owning >=1 residual edge (sentinel >= N pads);
    u_src / u_emask: [U, epn] those rows' full edge table slice; t: scalar;
    u_inv: optional [N] int32 inverse of u_rows (build_u_inv) — makes the
    overwrite and its cotangent split scatter-free.

    Grad flows to y and t only (int tables and masks get zeros/float0 like
    the jnp banded path).
    """
    (out,), _ = _banded_core_fwd(y, offs, band_mask, t, False, interpret)
    N, C = y.shape
    out = out[:N, :C]
    out_u = _exact_rows(y, u_src, u_emask, t).astype(out.dtype)
    return _overwrite_u(out, out_u, u_rows, u_inv)


def _pba_fwd(y, offs, band_mask, u_rows, u_src, u_emask, t, u_inv,
             interpret):
    (out, m, den), _ = _banded_core_fwd(y, offs, band_mask, t, True,
                                        interpret)
    N, C = y.shape
    out_b = out[:N, :C]
    out_u = _exact_rows(y, u_src, u_emask, t).astype(out_b.dtype)
    full = _overwrite_u(out_b, out_u, u_rows, u_inv)
    # residuals: keep the PADDED banded stats (the bwd kernel re-pads
    # nothing), the padded banded out (pre-overwrite — the kernel backward
    # differentiates the banded function, whose cotangent at overwritten
    # rows is zeroed), and the small tables for the exact-row pullback.
    return full, (y, offs, band_mask, u_rows, u_src, u_emask,
                  jnp.asarray(t), u_inv, m, den, out)


def _pba_bwd(interpret, res, g):
    (y, offs, band_mask, u_rows, u_src, u_emask, t, u_inv, m, den,
     out_pad) = res
    N, C = y.shape
    in_range = (u_rows >= 0) & (u_rows < N)
    # cotangent splits: overwritten rows belong to the exact part, the rest
    # to the banded kernel (scatter-free select when u_inv is shipped)
    if u_inv is None:
        keep = jnp.ones((N,), g.dtype).at[u_rows].set(0.0, mode="drop")
        g_b = g * keep[:, None]
    else:
        sel = (u_inv < u_rows.shape[0])[:, None]
        g_b = jnp.where(sel, jnp.zeros((), g.dtype), g)
    dy_b, dt_b = _banded_core_bwd(y, offs, band_mask, t, m, den, out_pad,
                                  g_b, interpret)
    g_u = jnp.where(in_range[:, None], g[jnp.clip(u_rows, 0, N - 1)], 0.0)
    _, pullback = jax.vjp(lambda yy, tt: _exact_rows(yy, u_src, u_emask, tt),
                          y, t)
    dy_u, dt_u = pullback(g_u.astype(y.dtype))
    f0 = lambda a: np.zeros(jnp.shape(a), jax.dtypes.float0)
    dt = (dt_b + dt_u.astype(jnp.float32)).astype(t.dtype).reshape(t.shape)
    du_inv = None if u_inv is None else f0(u_inv)
    return ((dy_b + dy_u).astype(y.dtype), f0(offs),
            jnp.zeros_like(band_mask), f0(u_rows), f0(u_src),
            jnp.zeros_like(u_emask), dt, du_inv)


pallas_banded_aggregate.defvjp(_pba_fwd, _pba_bwd)


def build_u_tables(edge_src: np.ndarray, edge_mask: np.ndarray,
                   band_mask: np.ndarray, u_slots: int | None = None,
                   multiple: int = 8):
    """Row-level residual tables for the Pallas banded path.

    Returns (u_rows [U] int32 with sentinel N for padding, u_src [U, epn]
    int32 clipped in-range, u_emask [U, epn] f32): the rows owning at least
    one non-banded real edge, with their FULL dense edge-table slices, so
    the wrapper can recompute those rows exactly and overwrite the kernel's
    banded-only values.
    """
    N, epn = edge_src.shape
    resid = (edge_mask > 0) & (band_mask <= 0)
    rows = np.unique(np.nonzero(resid)[0]).astype(np.int32)
    U = len(rows)
    if u_slots is None:
        u_slots = _round_up(max(U, 1), multiple)
    assert U <= u_slots, f"need {U} residual-row slots, given {u_slots}"
    u_rows = np.full(u_slots, N, np.int32)
    u_src = np.zeros((u_slots, epn), np.int32)
    u_emask = np.zeros((u_slots, epn), np.float32)
    u_rows[:U] = rows
    u_src[:U] = np.clip(edge_src[rows], 0, max(N - 1, 0))
    u_emask[:U] = edge_mask[rows]
    return u_rows, u_src, u_emask


def build_u_inv(u_rows: np.ndarray, n_nodes: int) -> np.ndarray:
    """Inverse of u_rows: [N] int32, u_inv[r] = slot of row r in u_rows for
    residual rows, sentinel U elsewhere. Host-precomputed (cached with the
    other tables) so the wrapper's residual overwrite and cotangent split
    become pure gathers/selects — no XLA scatter in the train step."""
    U = int(u_rows.shape[0])
    u_inv = np.full(n_nodes, U, np.int32)
    valid = u_rows < n_nodes
    u_inv[u_rows[valid]] = np.nonzero(valid)[0].astype(np.int32)
    return u_inv
