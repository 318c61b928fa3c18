"""Segment (scatter) ops for padded graphs: softmax aggregation with learnable
temperature, as needed by GENConv-style message passing
(reference model/backbone.py:139 uses torch_geometric's C++/CUDA kernels).

Graphs are padded to static shapes: node features [N, C] with node mask,
edges [E, 2] (dst, src) with edge mask. Batched via vmap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def segment_softmax_aggregate(messages: jnp.ndarray, dst: jnp.ndarray,
                              edge_mask: jnp.ndarray, num_nodes: int,
                              t: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_e softmax_e(t * m_e over edges with dst==i) * m_e.

    messages: [E, C]; dst: [E] int; edge_mask: [E]; t: scalar temperature.
    Channel-wise softmax over each node's incoming edges (GENConv
    aggr='softmax', learn_t=True semantics). Nodes with no incoming edges
    aggregate to zeros.
    """
    E, C = messages.shape
    # route masked edges to a trash segment; edge lists are dst-sorted by
    # construction (tools/build_graphs.py emits np.repeat(range(n)) dst order
    # and the loader preserves/sorts it), which lets XLA lower the scatters as
    # sorted-segment reductions instead of generic scatter-adds
    seg = jnp.where(edge_mask.astype(bool), dst, num_nodes).astype(jnp.int32)
    scaled = messages * t
    seg_max = jax.ops.segment_max(
        jnp.where(edge_mask[:, None].astype(bool), scaled, -jnp.inf),
        seg, num_segments=num_nodes + 1, indices_are_sorted=True)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    # where-select BEFORE exp: a large message in a masked slot would
    # overflow exp to inf and inf*0 = NaN under the multiplicative form
    ex = jnp.where(edge_mask[:, None].astype(bool),
                   jnp.exp(scaled - seg_max[seg]), 0.0).astype(messages.dtype)
    denom = jax.ops.segment_sum(ex, seg, num_segments=num_nodes + 1,
                                indices_are_sorted=True)
    alpha = ex / jnp.maximum(denom[seg], 1e-16)
    out = jax.ops.segment_sum(alpha * messages, seg, num_segments=num_nodes + 1,
                              indices_are_sorted=True)
    return out[:num_nodes]


def segment_mean(values: jnp.ndarray, seg_ids: jnp.ndarray, mask: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Masked per-segment mean; empty segments give zeros."""
    seg = jnp.where(mask.astype(bool), seg_ids, num_segments).astype(jnp.int32)
    total = jax.ops.segment_sum(values * mask[:, None].astype(values.dtype),
                                seg, num_segments=num_segments + 1)
    count = jax.ops.segment_sum(mask.astype(values.dtype), seg,
                                num_segments=num_segments + 1)
    return (total / jnp.maximum(count, 1.0)[:, None])[:num_segments]


@jax.custom_vjp
def gather_rows_rev(x: jnp.ndarray, idx: jnp.ndarray, rev_idx: jnp.ndarray,
                    rev_mask: jnp.ndarray) -> jnp.ndarray:
    """``x[idx]`` whose VJP is a gather, not a scatter.

    The autodiff transpose of a gather is a scatter-add, which XLA:TPU lowers
    to (near-)serialized updates — it dominates PatchGCN's backward. Message
    gathers over a static graph have a precomputable transpose: the reverse
    edge table (``build_reverse_edge_table``) lists, for every source node,
    the flat positions of the gathered copies, so the cotangent is a gather +
    masked sum over out-edges.

    x: [N, C]; idx: [N, epn] source row per edge slot; rev_idx: [N, K] flat
    indices into N*epn (row-major over idx); rev_mask: [N, K] 1 = real entry.
    Returns x[idx] = [N, epn, C].

    CONTRACT (advisor r2): ``build_reverse_edge_table`` only indexes slots
    with edge_mask > 0, so cotangents arriving on masked slots are silently
    dropped — the caller must guarantee masked slots receive zero cotangent.
    GENConv's softmax aggregation satisfies this (masked-slot weights are
    exactly zero, so their gradient is zero); a new caller without that
    property must build the reverse table over ALL epn slots instead.
    """
    del rev_idx, rev_mask
    return x[idx]


def _grr_fwd(x, idx, rev_idx, rev_mask):
    # residuals must be JAX types: x dtype travels as a zero-size token
    return x[idx], (jnp.zeros((0,), x.dtype), rev_idx, rev_mask)


def _grr_bwd(res, g):
    x_token, rev_idx, rev_mask = res
    C = g.shape[-1]
    gf = g.reshape(-1, C)
    dx = jnp.sum(gf[rev_idx] * rev_mask[..., None].astype(g.dtype), axis=1)
    return (dx.astype(x_token.dtype),
            np.zeros(g.shape[:-1], jax.dtypes.float0),
            np.zeros(rev_idx.shape, jax.dtypes.float0),
            jnp.zeros_like(rev_mask))


gather_rows_rev.defvjp(_grr_fwd, _grr_bwd)


def build_reverse_edge_table(edge_src: np.ndarray, edge_mask: np.ndarray,
                             k: int | None = None, multiple: int = 8):
    """Exact transpose of a dense [N, epn] edge table (numpy, host-side).

    rev_idx[j, r] = flat index i*epn + s of the r-th edge slot whose source
    is j; rev_mask marks real entries. K defaults to the max out-degree
    rounded up to `multiple` (out-degree of kNN graphs is small but not
    bounded by epn). Feeding these to ``gather_rows_rev`` removes every
    scatter from the GNN train step.
    """
    N, epn = edge_src.shape
    flat = np.flatnonzero(edge_mask.reshape(-1) > 0)
    src = edge_src.reshape(-1)[flat]
    order = np.argsort(src, kind="stable")
    src_s, flat_s = src[order], flat[order]
    first = np.searchsorted(src_s, src_s, side="left")
    rpos = np.arange(src_s.shape[0]) - first
    kmax = int(rpos.max()) + 1 if src_s.size else 1
    if k is None:
        k = -(-max(kmax, 1) // multiple) * multiple
    assert kmax <= k, f"reverse table needs {kmax} slots, given {k}"
    rev_idx = np.zeros((N, k), np.int32)
    rev_mask = np.zeros((N, k), np.float32)
    rev_idx[src_s, rpos] = flat_s
    rev_mask[src_s, rpos] = 1.0
    return rev_idx, rev_mask


def _alpha_from_block(t_ref, em_ref, msg_ref, nb, epn):
    """Shared recomputation for both kernels: (m, alpha) of one node block.

    The numerically sensitive part (masked max with the zero-edge reset, the
    Mosaic-safe minor-dim insertion on f32) lives ONLY here so forward and
    backward can never drift apart.
    """
    t = t_ref[0, 0]
    m = msg_ref[:].astype(jnp.float32).reshape(nb, epn, -1)  # [nb, epn, C]
    em = em_ref[:]                                           # [nb, epn]
    mb = em[:, :, None] > 0   # insert the minor dim on f32 (Mosaic limit)
    s = m * t
    smax = jnp.max(jnp.where(mb, s, -1e30), axis=1, keepdims=True)
    smax = jnp.where(smax <= -1e29, 0.0, smax)   # zero-edge nodes
    ex = jnp.where(mb, jnp.exp(s - smax), 0.0)
    den = jnp.sum(ex, axis=1, keepdims=True)
    alpha = ex / jnp.maximum(den, 1e-16)
    return t, m, alpha


def _fused_agg_fwd_kernel(t_ref, em_ref, msg_ref, o_ref, *, nb, epn):
    _, m, alpha = _alpha_from_block(t_ref, em_ref, msg_ref, nb, epn)
    o_ref[:] = jnp.sum(alpha * m, axis=1).astype(o_ref.dtype)


def _fused_agg_bwd_kernel(t_ref, em_ref, msg_ref, g_ref, dm_ref, dt_ref,
                          *, nb, epn):
    t, m, alpha = _alpha_from_block(t_ref, em_ref, msg_ref, nb, epn)
    out = jnp.sum(alpha * m, axis=1, keepdims=True)           # [nb, 1, C]
    g = g_ref[:].astype(jnp.float32)[:, None, :]              # [nb, 1, C]
    # d out / d m_r = alpha_r * (1 + t * (m_r - out))   (channel-wise softmax)
    dm = g * alpha * (1.0 + t * (m - out))
    dm_ref[:] = dm.reshape(nb * epn, -1).astype(dm_ref.dtype)
    # d out / d t = sum_s alpha_s * m_s * (m_s - out); block-partial scalar
    dt = jnp.sum(g[:, 0, :] * jnp.sum(alpha * m * (m - out), axis=1))
    # full (8, 128) tile per block (TPU tiling minimum, incl. under vmap);
    # the wrapper sums all entries and divides by the exact 2^10 tile size
    dt_ref[:] = jnp.full((8, 128), dt, jnp.float32)


def _agg_padded_inputs(messages, edge_mask):
    """Shared pad/flatten plumbing for primal and backward: returns the
    row-flattened tile-aligned message table, padded mask, and geometry."""
    N, epn, C = messages.shape
    epn_p, c_p = _agg_pad_dims(epn, C)
    nb = _agg_block(N, epn_p, c_p)
    npad = ((N + nb - 1) // nb) * nb
    msg2 = jnp.pad(messages, ((0, npad - N), (0, epn_p - epn), (0, c_p - C)))
    msg2 = msg2.reshape(npad * epn_p, c_p)
    em = jnp.pad(edge_mask, ((0, npad - N), (0, epn_p - epn)))
    return msg2, em, nb, npad, epn_p, c_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_knn_softmax_aggregate(messages, edge_mask, t, interpret=False):
    """Pallas-fused version of :func:`knn_edge_softmax_aggregate`.

    One HBM pass over the [N, epn, C] message table per direction instead of
    the several passes XLA emits for the gather->max->exp->sum->div->reduce
    chain (BENCHNOTES.md: the chain, not the matmuls, dominates PatchGCN).
    messages: [N, epn, C]; edge_mask: [N, epn]; t: scalar temperature.
    Exact same semantics as the jnp path, which remains the oracle in tests.
    """
    N, epn, C = messages.shape
    msg2, em, nb, npad, epn_p, c_p = _agg_padded_inputs(messages, edge_mask)
    out = pl.pallas_call(
        functools.partial(_fused_agg_fwd_kernel, nb=nb, epn=epn_p),
        grid=(npad // nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t [1, 1]
            pl.BlockSpec((nb, epn_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * epn_p, c_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, c_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, c_p), messages.dtype),
        interpret=interpret,
    )(jnp.asarray(t).reshape(1, 1).astype(jnp.float32),
      em.astype(jnp.float32), msg2)
    return out[:N, :C]


def _agg_pad_dims(epn: int, C: int):
    # Mosaic needs tile-aligned shapes for the in-kernel [nb*epn, C] ->
    # [nb, epn, C] reshape — unaligned dims (e.g. the default epn=9, or
    # C < 128) blow the scoped-VMEM stack with relayout temporaries. Padding
    # slots carry edge_mask 0 (exact) and padded channels are sliced off.
    return -(-epn // 8) * 8, -(-C // 128) * 128


def _agg_block(N, epn, C) -> int:
    # block rows (nodes) sized so the bf16 message block stays ~<=512 KB
    nb = max(8, min(128, (1 << 19) // max(2 * epn * C, 1)))
    return max(8, (nb // 8) * 8)


def _fused_agg_vjp_fwd(messages, edge_mask, t, interpret):
    out = fused_knn_softmax_aggregate(messages, edge_mask, t, interpret)
    return out, (messages, edge_mask, jnp.asarray(t))


def _fused_agg_vjp_bwd(interpret, res, g):
    messages, edge_mask, t = res
    N, epn, C = messages.shape
    msg2, em, nb, npad, epn_p, c_p = _agg_padded_inputs(messages, edge_mask)
    gp = jnp.pad(g, ((0, npad - N), (0, c_p - C)))
    grid = (npad // nb,)
    dm2, dtp = pl.pallas_call(
        functools.partial(_fused_agg_bwd_kernel, nb=nb, epn=epn_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, epn_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * epn_p, c_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb * epn_p, c_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad * epn_p, c_p), messages.dtype),
            jax.ShapeDtypeStruct((npad // nb * 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(t.reshape(1, 1).astype(jnp.float32), em.astype(jnp.float32), msg2, gp)
    dmsg = dm2.reshape(npad, epn_p, c_p)[:N, :epn, :C]
    dt = (jnp.sum(dtp) / 1024.0).astype(t.dtype).reshape(jnp.shape(t))
    return dmsg, jnp.zeros_like(edge_mask), dt


fused_knn_softmax_aggregate.defvjp(_fused_agg_vjp_fwd, _fused_agg_vjp_bwd)


def build_band_tables(edge_src: np.ndarray, edge_mask: np.ndarray,
                      res_slots: int | None = None, multiple: int = 128):
    """Decompose a dense [N, epn] edge table into a BANDED part + residuals.

    Raster-ordered spatial kNN graphs (tools/build_graphs.py emits nodes in
    scan order) have near-banded structure: for interior nodes, edge slot s
    always points to src = n + o_s for a fixed per-slot offset o_s (the 8
    grid neighbors). The banded part of the message gather is then ~epn
    rolled copies of the node features — pure streaming, no gathers, and its
    autodiff transpose is rolls again (VERDICT r2 #5). Boundary nodes and
    any irregular edges go into a small exact residual list.

    Returns (offs [epn] int32 per-slot modal offset,
             band_mask [N, epn] f32 edge is real AND fits its slot's band,
             res_node [R] int32, res_src [R] int32, res_mask [R] f32)
    where R = res_slots or roundup(#residual edges, multiple). Every real
    edge lands in exactly one of band/residual, so
    banded_knn_softmax_aggregate reproduces knn_edge_softmax_aggregate
    exactly (up to summation order).
    """
    N, epn = edge_src.shape
    n_idx = np.arange(N, dtype=np.int64)[:, None]
    valid = edge_mask > 0
    d = edge_src.astype(np.int64) - n_idx
    offs = np.zeros(epn, np.int32)
    for s in range(epn):
        col = d[valid[:, s], s]
        if col.size:
            vals, counts = np.unique(col, return_counts=True)
            offs[s] = vals[np.argmax(counts)]
    target = n_idx + offs[None, :].astype(np.int64)
    banded = valid & (edge_src == target) & (target >= 0) & (target < N)
    rn, rs = np.nonzero(valid & ~banded)
    n_res = len(rn)
    if res_slots is None:
        res_slots = -(-max(n_res, 1) // multiple) * multiple
    assert n_res <= res_slots, f"need {n_res} residual slots, given {res_slots}"
    res_node = np.zeros(res_slots, np.int32)
    res_src = np.zeros(res_slots, np.int32)
    res_mask = np.zeros(res_slots, np.float32)
    res_node[:n_res] = rn
    res_src[:n_res] = edge_src[rn, rs]
    res_mask[:n_res] = 1.0
    return offs, banded.astype(np.float32), res_node, res_src, res_mask


def band_coverage(edge_src: np.ndarray, edge_mask: np.ndarray):
    """(banded_fraction, n_residual_edges, n_residual_rows, max_abs_offset)
    of a dense edge table — used by the batcher's construction-time pre-scan
    to fix the banded on/off decision, the residual slot counts (edge-level
    for the jnp rolls path, row-level for the Pallas kernel path), and the
    kernel's block-size admissibility before the first batch."""
    offs, bmask, _, _, res_mask = build_band_tables(edge_src, edge_mask)
    n_valid = int((edge_mask > 0).sum())
    n_band = int(bmask.sum())
    n_rows = len(np.unique(np.nonzero((edge_mask > 0) & (bmask <= 0))[0]))
    return ((n_band / max(n_valid, 1)), int(res_mask.sum()), n_rows,
            int(np.abs(offs).max(initial=0)))


def _banded_fwd_stats(y, offs, band_mask, res_node, res_src, res_mask, t):
    """(max M, denom, out) of the banded masked channel-wise softmax
    aggregation — shared by the forward and the recompute-based backward."""
    epn = band_mask.shape[1]
    neg = -jnp.inf
    scaled_t = jnp.asarray(t, jnp.float32)
    rolls = [jnp.roll(y, -offs[s], axis=0) for s in range(epn)]  # [N, C] each
    bm = [band_mask[:, s].astype(bool)[:, None] for s in range(epn)]
    # channel-wise max over real slots (residuals included via scatter-max)
    m = jnp.full_like(y, neg, dtype=jnp.float32)
    for s in range(epn):
        m = jnp.maximum(m, jnp.where(bm[s], rolls[s].astype(jnp.float32)
                                     * scaled_t, neg))
    res_y = y[res_src]                                    # [R, C] small gather
    res_scaled = res_y.astype(jnp.float32) * scaled_t
    rmask = res_mask.astype(bool)[:, None]
    m = m.at[res_node].max(jnp.where(rmask, res_scaled, neg), mode="drop")
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    # exp-sum passes (where-select before exp: see knn_edge_softmax_aggregate)
    denom = jnp.zeros_like(y, dtype=jnp.float32)
    num = jnp.zeros_like(y, dtype=jnp.float32)
    for s in range(epn):
        ex = jnp.where(bm[s],
                       jnp.exp(rolls[s].astype(jnp.float32) * scaled_t - m),
                       0.0)
        denom = denom + ex
        num = num + ex * rolls[s].astype(jnp.float32)
    res_ex = jnp.where(rmask, jnp.exp(res_scaled - m[res_node]), 0.0)
    denom = denom.at[res_node].add(res_ex, mode="drop")
    num = num.at[res_node].add(
        res_ex * res_y.astype(jnp.float32), mode="drop")
    out = num / jnp.maximum(denom, 1e-16)
    return m, denom, out


@jax.custom_vjp
def banded_knn_softmax_aggregate(y: jnp.ndarray, offs: jnp.ndarray,
                                 band_mask: jnp.ndarray, res_node: jnp.ndarray,
                                 res_src: jnp.ndarray, res_mask: jnp.ndarray,
                                 t: jnp.ndarray) -> jnp.ndarray:
    """knn_edge_softmax_aggregate for near-banded graphs, without the gather.

    y: [N, C] source-node messages (relu(x) + eps — per-source, so the dense
    message table is y[edge_src] and never needs materializing); offs /
    band_mask / res_* from build_band_tables; t: scalar temperature.

    The banded slots stream as epn rolled copies of y (roll wrap-around is
    masked off — out-of-range targets were routed to the residual list), so
    XLA fuses the whole masked-softmax chain into a few sequential passes
    over [N, C] arrays instead of a 146 GB/s row-gather over [N, epn, C]
    (BENCHNOTES round-2 ablation). Residual edges contribute through
    R-sized scatter-max / scatter-add updates (R ~ boundary edges ~ O(sqrt N)
    for raster grids).

    custom VJP: plain autodiff would save every rolled/exponentiated
    intermediate (~2x the gather path's HBM traffic in the backward); the
    hand-written backward saves only (M, denom, out) and recomputes the
    per-slot softmax from y — the cotangent of a roll is the opposite roll,
    so the whole backward streams too.
    """
    _, _, out = _banded_fwd_stats(y, offs, band_mask, res_node, res_src,
                                  res_mask, t)
    return out.astype(y.dtype)


def _banded_vjp_fwd(y, offs, band_mask, res_node, res_src, res_mask, t):
    m, denom, out = _banded_fwd_stats(y, offs, band_mask, res_node, res_src,
                                      res_mask, t)
    return out.astype(y.dtype), (y, offs, band_mask, res_node, res_src,
                                 res_mask, t, m, denom, out)


def _banded_vjp_bwd(res, g):
    y, offs, band_mask, res_node, res_src, res_mask, t, m, denom, out = res
    epn = band_mask.shape[1]
    st = jnp.asarray(t, jnp.float32)
    g32 = g.astype(jnp.float32)
    inv_den = 1.0 / jnp.maximum(denom, 1e-16)
    dy = jnp.zeros(y.shape, jnp.float32)
    dt = jnp.zeros((), jnp.float32)
    # d out/d m_s = alpha_s * (1 + t*(m_s - out)); d out/d t via
    # d alpha_s/dt = alpha_s*(m_s - out)
    for s in range(epn):
        bm_s = band_mask[:, s].astype(bool)[:, None]
        ms = jnp.roll(y, -offs[s], axis=0).astype(jnp.float32)
        al = jnp.where(bm_s, jnp.exp(ms * st - m), 0.0) * inv_den
        dms = g32 * al * (1.0 + st * (ms - out))
        dy = dy + jnp.roll(jnp.where(bm_s, dms, 0.0), offs[s], axis=0)
        dt = dt + jnp.sum(g32 * al * ms * (ms - out))
    rmask = res_mask.astype(bool)[:, None]
    ms_r = y[res_src].astype(jnp.float32)
    al_r = jnp.where(rmask, jnp.exp(ms_r * st - m[res_node]), 0.0) \
        * inv_den[res_node]
    out_r = out[res_node]
    dms_r = g32[res_node] * al_r * (1.0 + st * (ms_r - out_r))
    dy = dy.at[res_src].add(jnp.where(rmask, dms_r, 0.0), mode="drop")
    dt = dt + jnp.sum(g32[res_node] * al_r * ms_r * (ms_r - out_r))
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dy.astype(y.dtype), f0(offs), jnp.zeros_like(band_mask),
            f0(res_node), f0(res_src), jnp.zeros_like(res_mask),
            dt.astype(jnp.asarray(t).dtype))


banded_knn_softmax_aggregate.defvjp(_banded_vjp_fwd, _banded_vjp_bwd)


def knn_edge_softmax_aggregate(messages: jnp.ndarray, edge_mask: jnp.ndarray,
                               t: jnp.ndarray) -> jnp.ndarray:
    """Dense fixed-degree variant of segment softmax aggregation.

    kNN graphs have a bounded (and, from the offline tool, exact) in-degree:
    every node owns at most `epn` incoming edges. Laying edges out as a dense
    [N, epn] table turns the three scatter-backed segment reductions into a
    masked softmax over axis 1 — no scatters at all, which collapses both
    XLA compile time and runtime on TPU (scatter lowers to serialized updates;
    VERDICT r1 #5).

    messages: [N, epn, C] gathered source messages per destination node;
    edge_mask: [N, epn] 1 = real edge; t: scalar temperature.
    Nodes with no incoming edges aggregate to zeros (matching
    segment_softmax_aggregate).
    """
    mb = edge_mask.astype(bool)[..., None]
    scaled = messages * t
    neg = jnp.asarray(-jnp.inf, scaled.dtype)
    masked = jnp.where(mb, scaled, neg)
    m = jnp.max(masked, axis=1, keepdims=True)          # [N, 1, C]
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    # where-select BEFORE exp (see segment_softmax_aggregate; keeps this
    # oracle path NaN-free exactly like the fused Pallas kernel)
    ex = jnp.where(mb, jnp.exp(scaled - m), 0.0).astype(messages.dtype)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    alpha = ex / jnp.maximum(denom, 1e-16)
    return jnp.sum(alpha * messages, axis=1)            # [N, C]


def build_band_tables_matched(edge_src: np.ndarray, edge_mask: np.ndarray,
                              k: int | None = None,
                              offsets: np.ndarray | None = None,
                              res_slots: int | None = None,
                              multiple: int = 128):
    """Band tables by OFFSET MATCHING instead of slot position.

    `build_band_tables` assigns slot s the modal offset of the edges that
    happen to sit in column s of the dense table — which depends on the kNN
    neighbor ordering and collapses on real tissue graphs (distance ties put
    the same grid neighbor in different columns row to row). The softmax
    aggregation is invariant to slot permutation, so this builder instead
    picks the top-k most frequent offsets of the whole table (or takes them
    as given) and marks band_mask[n, s] = 1 iff n + o_s is one of n's real
    sources, regardless of which column the edge occupied. On a grid-raster
    layout (see `grid_layout`) the top-8 offsets are exactly the 8 grid
    neighbors and coverage is limited only by genuinely non-adjacent kNN
    edges (measured ~0.94 on tissue-masked slides vs ~0.3 for the
    slot-positional builder).

    Returns (offs [k] int32, band_mask [N, k] f32 slot-space,
             edge_banded [N, epn] f32 edge-space — feed to build_u_tables,
             res_node [R], res_src [R], res_mask [R]).
    Every real edge lands in exactly one of band/residual (sources are
    unique per node, so each (node, offset) matches at most one edge).
    """
    N, epn = edge_src.shape
    if k is None:
        k = epn
    n_idx = np.arange(N, dtype=np.int64)[:, None]
    valid = edge_mask > 0
    d = edge_src.astype(np.int64) - n_idx
    if offsets is None:
        col = d[valid]
        if col.size:
            vals, counts = np.unique(col, return_counts=True)
            top = vals[np.argsort(-counts)[:k]]
        else:
            top = np.zeros(0, np.int64)
        if len(top) < k:
            # pad with small DISTINCT offsets: duplicates would double-count
            # an edge across two slots, and out-of-range pads would breach
            # the Pallas kernel's |offset| < block-size read window. A
            # distinct in-range pad is exact — it simply matches (and bands)
            # any real edges at that offset.
            pads = [o for o in range(-(k + 1), k + 2)
                    if o not in set(top.tolist())][:k - len(top)]
            top = np.concatenate([top, np.asarray(pads, np.int64)])
        offs = np.sort(top).astype(np.int32)
    else:
        offs = np.asarray(offsets, np.int32)
        assert offs.shape == (k,)
    # edge is banded iff its offset is one of the chosen k
    edge_banded = (valid & np.isin(d, offs)).astype(np.float32)
    # slot-space mask: node n has a real source at n + offs[s]
    hit = valid[:, :, None] & (d[:, :, None] == offs[None, None, :].astype(np.int64))
    target = n_idx + offs[None, :].astype(np.int64)
    band_mask = (hit.any(axis=1) & (target >= 0) & (target < N)).astype(np.float32)
    rn, rs = np.nonzero(valid & (edge_banded <= 0))
    n_res = len(rn)
    if res_slots is None:
        res_slots = -(-max(n_res, 1) // multiple) * multiple
    assert n_res <= res_slots, f"need {n_res} residual slots, given {res_slots}"
    res_node = np.zeros(res_slots, np.int32)
    res_src = np.zeros(res_slots, np.int32)
    res_mask = np.zeros(res_slots, np.float32)
    res_node[:n_res] = rn
    res_src[:n_res] = edge_src[rn, rs]
    res_mask[:n_res] = 1.0
    return offs, band_mask, edge_banded, res_node, res_src, res_mask


@jax.custom_vjp
def grid_place(y: jnp.ndarray, gidx: jnp.ndarray,
               ginv: jnp.ndarray) -> jnp.ndarray:
    """Tissue -> grid placement as a PURE GATHER (round 5, VERDICT r4 #2).

    gidx [N] maps patch p to its grid cell (sentinel >= G for padded patch
    rows); ginv [G] is the inverse map (sentinel >= N for tissue-free
    cells) — a bijection on the valid entries, so BOTH directions and BOTH
    VJPs are gathers. Replaces `zeros.at[gidx].set(y)` whose XLA lowering
    is a scatter (serialized updates on TPU) in the forward, and whose VJP
    gather produced a scatter again on the output side; the banded graph
    step becomes scatter-free end to end.
    """
    n = y.shape[0]
    valid = ginv < n
    safe = jnp.minimum(ginv, n - 1)
    return jnp.where(valid[:, None], y[safe], 0).astype(y.dtype)


def _grid_place_fwd(y, gidx, ginv):
    return grid_place(y, gidx, ginv), (gidx, ginv.shape[0])


def _grid_place_bwd(res, g):
    gidx, n_grid = res
    # d y[p] = g[gidx[p]] for placed patches (bijectivity), else 0; the
    # cotangent dtype equals the primal's (fwd casts to y.dtype)
    valid = gidx < n_grid
    safe = jnp.minimum(gidx, n_grid - 1)
    dy = jnp.where(valid[:, None], g[safe], 0).astype(g.dtype)
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return dy, f0(gidx.shape), f0((n_grid,))


grid_place.defvjp(_grid_place_fwd, _grid_place_bwd)


@jax.custom_vjp
def grid_take(agg: jnp.ndarray, gidx: jnp.ndarray,
              ginv: jnp.ndarray) -> jnp.ndarray:
    """Grid -> tissue read-back, the inverse of `grid_place` (same bijection,
    same scatter-free guarantee: the VJP scatters the patch cotangent into
    grid space via a gather over ginv)."""
    n_grid = agg.shape[0]
    valid = gidx < n_grid
    safe = jnp.minimum(gidx, n_grid - 1)
    return jnp.where(valid[:, None], agg[safe], 0).astype(agg.dtype)


def _grid_take_fwd(agg, gidx, ginv):
    return grid_take(agg, gidx, ginv), (ginv, gidx.shape[0])


def _grid_take_bwd(res, g):
    ginv, n = res
    valid = ginv < n
    safe = jnp.minimum(ginv, n - 1)
    dagg = jnp.where(valid[:, None], g[safe], 0).astype(g.dtype)
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return dagg, f0((n,)), f0(ginv.shape)


grid_take.defvjp(_grid_take_fwd, _grid_take_bwd)


def crop_empty_grid_lines(gidx: np.ndarray, W: int):
    """Remove fully-empty rows/columns from a slide's bounding-box grid.

    Tissue fills only ~half of its bounding box on real slides (measured
    inflation 1.78, BENCHNOTES round 4), and the banded kernel's work
    scales with grid AREA. Dropping grid rows/columns containing no tissue
    is a pure relabeling of the SAME graph: cells that were raster-adjacent
    stay adjacent (no empty line can separate cells at distance 1), so
    banded edges keep their offsets, while edges that spanned removed empty
    lines compress onto shorter offsets — band coverage can only grow.

    Returns (row [N], col [N], W_cropped, H_cropped).
    """
    row, col = gidx // W, gidx % W
    ur, uc = np.unique(row), np.unique(col)
    return (np.searchsorted(ur, row), np.searchsorted(uc, col),
            int(len(uc)), int(len(ur)))


def grid_layout(coords: np.ndarray, tol: float = 0.25):
    """Snap WSI patch centroids to their extraction grid.

    Real slide graphs are built over patches tiled on a regular grid
    (tools/big_to_small_patching.py); compact raster renumbering of the
    tissue mask is what destroys banding (vertical neighbor offsets become
    the varying per-row tissue width). Embedding the nodes back into the
    bounding-box grid makes every grid-neighbor offset a global constant
    {+-1, +-W, +-(W+-1)} at the cost of padded (tissue-free) rows.

    Returns (grid_idx [N] int64 row-major grid position, W, H) or None when
    the coords do not snap to a regular grid within `tol * step` (then the
    caller falls back to the compact gather paths).
    """
    if coords is None or coords.ndim != 2 or coords.shape[1] < 2:
        return None
    out_rc = []
    dims = []
    for axis in range(2):
        v = coords[:, axis].astype(np.float64)
        lo = v.min()
        u = np.unique(v)
        if len(u) == 1:
            step = 1.0
        else:
            diffs = np.diff(u)
            step = float(np.min(diffs[diffs > 0]))
        idx = np.round((v - lo) / step)
        if np.max(np.abs((v - lo) / step - idx)) > tol:
            return None
        out_rc.append(idx.astype(np.int64))
        dims.append(int(idx.max()) + 1)
    col, row = out_rc[0], out_rc[1]
    W, H = dims[0], dims[1]
    gidx = row * W + col
    if len(np.unique(gidx)) != len(gidx):  # duplicate patches: not a grid
        return None
    return gidx, W, H
