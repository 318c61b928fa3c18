"""Segment (scatter) ops for padded graphs: softmax aggregation with learnable
temperature, as needed by GENConv-style message passing
(reference model/backbone.py:139 uses torch_geometric's C++/CUDA kernels).

Graphs are padded to static shapes: node features [N, C] with node mask,
edges [E, 2] (dst, src) with edge mask. Batched via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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
    ex = jnp.exp(scaled - seg_max[seg]) * edge_mask[:, None].astype(messages.dtype)
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
    ex = jnp.exp(scaled - m) * mb.astype(messages.dtype)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    alpha = ex / jnp.maximum(denom, 1e-16)
    return jnp.sum(alpha * messages, axis=1)            # [N, C]
