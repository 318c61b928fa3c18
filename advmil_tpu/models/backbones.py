"""MIL encoder backbones: ABMIL, DeepAttnMISL, PatchGCN, DualTransHS (ESAT).

All take a padded bag and mask(s) and return a bag embedding H [B, dim_out]
(prediction heads removed), mirroring the reference backbone zoo
(reference model/backbone.py:19-196) but batched + masked for TPU.

Call convention: backbone(x, mask, extra, *, deterministic)
  - x:    [B, N, C] padded patch features
  - mask: [B, N] 1 = real patch
  - extra: mode-dependent — None (abmil), cluster ids [B, N] (cluster),
    dict(edge_index [B, E, 2], edge_mask [B, E]) (graph), or region coords
    [B, N/16, 2] (patch, optional positional embedding).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (DenseInit, Dropout, GatedAttention, GAPool,
                     TransformerEncoderLayer, make_dense, make_embedding_layer,
                     compute_dtype)
from ..ops.masked import masked_softmax, region_mask_from_patch_mask
from ..ops.attention import pallas_available
from ..ops.banded_pallas import pallas_banded_aggregate
from ..ops.segment import (banded_knn_softmax_aggregate,
                           fused_knn_softmax_aggregate, gather_rows_rev,
                           grid_place, grid_take,
                           knn_edge_softmax_aggregate)
from ..ops.pe import compute_pe


class ABMIL(nn.Module):
    """Gated-attention MIL (reference model/backbone.py:54-86)."""
    dims: Sequence[int]          # [in, hid, out]
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, mask, extra=None, *, deterministic: bool):
        dim_in, dim_hid, dim_out = self.dims
        h = make_dense(dim_hid, self.dense_init, in_features=dim_in, name="attn_fc")(x)
        h = nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        scores = GatedAttention(dim_hid, dim_hid, dropout=self.dropout,
                                dense_init=self.dense_init, name="gate")(
            h, deterministic=deterministic)           # [B, N, 1]
        attn = masked_softmax(scores[..., 0], mask, axis=-1)
        pooled = jnp.einsum("bn,bnd->bd", attn, h)
        out = make_dense(dim_out, self.dense_init, in_features=dim_hid, name="rho")(pooled)
        out = nn.relu(out)
        out = Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class DeepAttnMISL(nn.Module):
    """Cluster-based MIL (reference model/backbone.py:89-123): per-cluster
    FC+ReLU then average pool, gated attention over the k cluster embeddings.
    Empty clusters contribute zeros yet still participate in the attention
    softmax, exactly as the reference.

    Init subtlety: the reference's `phis` is a Conv2d, and the xavier re-init
    applied for sigmoid-output tasks (reference model/model_utils.py:13-17,
    applied at baseline_handler.py:86-87 / model_handler.py) touches ONLY
    nn.Linear — so in every reference run the phis layer keeps the torch
    Conv2d DEFAULT init (kaiming-uniform kernel + nonzero uniform bias).
    We mirror that: when the backbone-wide scheme is XAVIER (the Linear-only
    re-init context), phis uses the TORCH default instead; pt041
    (general_init_weight) re-inits Conv2d too, so it passes through. Getting
    this wrong measurably slows early ranking convergence (PARITY.md cluster
    note)."""
    dims: Sequence[int]
    num_clusters: int = 8
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, mask, extra=None, *, deterministic: bool):
        dim_in, dim_hid, dim_out = self.dims
        assert dim_hid == dim_out
        cluster_id = extra                               # [B, N]
        phis_init = (DenseInit.TORCH if self.dense_init == DenseInit.XAVIER
                     else self.dense_init)
        phi = nn.relu(make_dense(dim_hid, phis_init, in_features=dim_in,
                                 name="phis")(x))        # [B, N, hid]
        # masked mean per cluster: one-hot matmul keeps it on the MXU
        cid = jnp.where(mask.astype(bool), cluster_id.astype(jnp.int32), -1)
        onehot = jax.nn.one_hot(cid, self.num_clusters, dtype=phi.dtype)  # [B,N,K]
        totals = jnp.einsum("bnk,bnd->bkd", onehot, phi)
        counts = jnp.sum(onehot, axis=1)                 # [B, K]
        h_cluster = totals / jnp.maximum(counts, 1.0)[..., None]
        # gated attention pool over the K cluster embeddings (all valid)
        h = make_dense(dim_hid, self.dense_init, in_features=dim_hid, name="attn_fc")(h_cluster)
        h = nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        scores = GatedAttention(dim_hid, dim_hid, dropout=self.dropout,
                                dense_init=self.dense_init, name="gate")(
            h, deterministic=deterministic)
        attn = jax.nn.softmax(scores[..., 0], axis=-1)
        return jnp.einsum("bk,bkd->bd", attn, h)


class GENConv(nn.Module):
    """GENConv with softmax aggregation and learnable temperature
    (DeeperGCN; matches torch_geometric semantics used at reference
    model/backbone.py:139): m_ij = relu(x_j) + eps; alpha = channel-wise
    softmax over incoming edges of t * m; out_i = MLP(x_i + sum alpha * m)."""
    dim: int
    eps: float = 1e-7
    dense_init: str = DenseInit.XAVIER
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, edge_src, edge_mask, rev_idx=None, rev_mask=None,
                 band=None, *, deterministic: bool):
        # x: [N, C]; edge_src: [N, epn] source node per incoming edge slot;
        # edge_mask: [N, epn] 1 = real edge. The dense fixed-degree layout
        # avoids scatters in the forward (kNN in-degree is bounded by epn);
        # when the batcher also supplies the reverse edge table, the gather's
        # VJP becomes a gather too — zero scatters in the whole train step.
        # When the batcher detects near-banded (raster spatial kNN) structure
        # it ships band tables instead, and the message gather disappears
        # entirely: rolled feature copies + a small exact residual list
        # (ops/segment.banded_knn_softmax_aggregate).
        t = self.param("t", nn.initializers.ones, (1,))
        xr = nn.relu(x)
        if band is not None:
            y = xr + self.eps
            gidx = band.get("gidx")
            ginv = band.get("ginv")
            if gidx is not None:
                # grid-raster banding (real tissue graphs): band tables live
                # in the slide's bounding-box grid layout, where every grid
                # neighbor is a constant offset. Placement in/out of grid
                # space rides the batcher-shipped bijection (gidx + its
                # inverse ginv) through the scatter-free custom-VJP pair
                # grid_place/grid_take (round 5); without ginv (older
                # tables) it falls back to the XLA scatter. Padded bag rows
                # carry the out-of-range sentinel and are dropped / zeroed.
                n_grid = band["mask"].shape[0]
                if ginv is not None:
                    y_agg = grid_place(y, gidx, ginv)
                else:
                    valid = gidx < n_grid
                    y_agg = jnp.zeros((n_grid, y.shape[1]), y.dtype
                                      ).at[gidx].set(y, mode="drop")
            else:
                y_agg = y
            if "u_rows" in band and self.use_pallas and pallas_available():
                # VMEM-resident banded kernel + exact residual-row overwrite
                # (ops/banded_pallas.py) — zero HBM roll materialization
                aggr = pallas_banded_aggregate(
                    y_agg, band["offs"], band["mask"], band["u_rows"],
                    band["u_src"], band["u_emask"], t[0],
                    band.get("u_inv"))
            else:
                aggr = banded_knn_softmax_aggregate(
                    y_agg, band["offs"], band["mask"], band["res_node"],
                    band["res_src"], band["res_mask"], t[0])
            if gidx is not None:
                if ginv is not None:
                    aggr = grid_take(aggr, gidx, ginv)
                else:
                    safe = jnp.minimum(gidx, n_grid - 1)
                    aggr = jnp.where(valid[:, None], aggr[safe], 0.0)
        else:
            if rev_idx is not None:
                msg = gather_rows_rev(xr, edge_src, rev_idx, rev_mask) + self.eps
            else:
                msg = xr[edge_src] + self.eps           # [N, epn, C] gather
            # fused one-HBM-pass Pallas aggregation on TPU; jnp chain elsewhere
            if self.use_pallas and pallas_available():
                aggr = fused_knn_softmax_aggregate(msg, edge_mask, t[0])
            else:
                aggr = knn_edge_softmax_aggregate(msg, edge_mask, t[0])
        h = x + aggr
        # MLP channels [C, 2C, C] with LayerNorm+ReLU between (pyg MLP, norm='layer')
        h = make_dense(2 * self.dim, self.dense_init, in_features=self.dim, name="mlp0")(h)
        # NOT the fused ops/ln_pool.ln_relu kernel: measured 789 vs 848 bags/s
        # end-to-end (BENCHNOTES "plain LN+ReLU fusion in GENConv") — XLA
        # fuses this chain with the latency-bound MLP matmuls, and breaking
        # that fusion costs more than the kernel saves at [3392, 768]
        h = nn.LayerNorm(dtype=compute_dtype(), name="mlp_norm")(h)
        h = nn.relu(h)
        h = make_dense(self.dim, self.dense_init, in_features=2 * self.dim, name="mlp1")(h)
        return h


class DeepGCNBlock(nn.Module):
    """DeepGCNLayer(block='res'): dropout(x + relu(layernorm(conv(x))))
    with dropout 0.1 (reference model/backbone.py:142). Rematerialized under
    grad (jax.checkpoint), the TPU analogue of the reference's ckpt_grad."""
    dim: int
    dropout: float = 0.1
    dense_init: str = DenseInit.XAVIER
    det: bool = True  # static field so nn.remat sees no traced bool arg
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, edge_index, edge_mask, rev_idx=None, rev_mask=None,
                 band=None):
        h = GENConv(self.dim, dense_init=self.dense_init,
                    use_pallas=self.use_pallas, name="conv")(
            x, edge_index, edge_mask, rev_idx, rev_mask, band,
            deterministic=self.det)
        # unfused on purpose — same measured negative result as GENConv's
        # mlp_norm (see comment there / BENCHNOTES)
        h = nn.LayerNorm(dtype=compute_dtype(), name="norm")(h)
        h = nn.relu(h)
        h = x + h
        h = Dropout(self.dropout)(h, deterministic=self.det)
        return h


class PatchGCN(nn.Module):
    """Graph MIL encoder (reference model/backbone.py:126-168): FC embed,
    GENConv stack with dense concatenation of all layer outputs, then
    gated-attention pooling over nodes.

    grid_resident (round 5, OFF by default — measured negative): with
    grid-raster band tables, keep the WHOLE stack in the slide's
    bounding-box grid layout — one placement after the embed, zero
    per-layer place/take, pooling directly on grid rows with the mask
    gathered through the bijection. Measured on tool-built tissue graphs
    it LOSES ~5% (484 vs 511 bags/s): XLA had already fused the per-layer
    placements into their consumers, so eliminating them only inflated
    every LN/MLP/dense row op by the grid inflation (1.37x rows at the
    bench shapes) — the profile's "shuttle" fusions carried the real row
    work (BENCHNOTES round 5). Kept as an option for low-inflation
    datasets; deterministic forwards/grads are exactly equal to the
    shuttle path (test-pinned), while dropout masks draw in grid shape
    (different stream)."""
    dims: Sequence[int]
    num_layers: int = 1
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER
    use_pallas: bool = True
    grid_resident: bool = False

    @nn.compact
    def __call__(self, x, mask, extra=None, *, deterministic: bool):
        dim_in, dim_hid, dim_out = self.dims
        # [B, N, epn] dense edge tables; absent (None) under banded
        # streaming, where the batcher ships band tables instead and the
        # message gather never happens
        edge_index = extra.get("edge_src") if hasattr(extra, "get") \
            else extra["edge_src"]
        edge_mask = extra.get("edge_mask") if hasattr(extra, "get") \
            else extra["edge_mask"]
        # reverse edge table [B, N, K]: optional, makes the message-gather
        # VJP scatter-free (ops/segment.gather_rows_rev)
        rev_idx = extra.get("rev_idx") if hasattr(extra, "get") else None
        rev_mask = extra.get("rev_mask") if hasattr(extra, "get") else None
        # banded streaming tables (mutually exclusive with rev tables):
        # per-slot offsets + membership mask + exact residual list, with two
        # optional extensions — row-level residual tables (Pallas kernel
        # eligible) and a grid-layout index (grid-raster banding for real
        # tissue graphs whose compact numbering is not banded)
        band = None
        if hasattr(extra, "get") and extra.get("band_offs") is not None:
            band = {"offs": extra["band_offs"], "mask": extra["band_mask"],
                    "res_node": extra["res_node"], "res_src": extra["res_src"],
                    "res_mask": extra["res_mask"]}
            if extra.get("band_urows") is not None:
                band.update(u_rows=extra["band_urows"],
                            u_src=extra["band_usrc"],
                            u_emask=extra["band_uemask"])
                if extra.get("band_uinv") is not None:
                    band["u_inv"] = extra["band_uinv"]
            if extra.get("band_gidx") is not None:
                band["gidx"] = extra["band_gidx"]
                if extra.get("band_ginv") is not None:
                    band["ginv"] = extra["band_ginv"]

        h = make_dense(dim_hid, self.dense_init, in_features=dim_in, name="fc")(x)
        h = nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)

        if (self.grid_resident and band is not None and "gidx" in band
                and "ginv" in band):
            # stay in grid layout for the whole stack: place once here,
            # never take — GENConv sees a band dict without gidx/ginv and
            # treats its input as already grid-resident (its y_agg = y
            # branch). The pooling mask rides the same bijection.
            gidx, ginv = band.pop("gidx"), band.pop("ginv")
            h = jax.vmap(grid_place)(h, gidx, ginv)
            mask = jax.vmap(grid_place)(mask[..., None].astype(h.dtype),
                                        gidx, ginv)[..., 0]

        # first layer applies the bare conv (reference model/backbone.py:157)
        conv0 = GENConv(dim_hid, dense_init=self.dense_init,
                        use_pallas=self.use_pallas, name="layer0_conv")
        h0 = _vmap_graph(conv0, h, edge_index, edge_mask, rev_idx, rev_mask,
                         band, deterministic=deterministic)
        feats = [h, h0]
        cur = h0
        for i in range(1, self.num_layers):
            blk_cls = nn.remat(DeepGCNBlock) if (i + 1) % 3 else DeepGCNBlock
            blk = blk_cls(dim_hid, dense_init=self.dense_init,
                          det=deterministic, use_pallas=self.use_pallas,
                          name=f"layer{i}")
            cur = _vmap_graph(blk, cur, edge_index, edge_mask, rev_idx,
                              rev_mask, band)
            feats.append(cur)
        h_path = jnp.concatenate(feats, axis=-1)         # [B, N, hid*(1+L)]
        h_path = make_dense(dim_out, self.dense_init,
                            in_features=dim_hid * (1 + self.num_layers),
                            name="path_phi")(h_path)
        h_path = nn.relu(h_path)
        h_path = Dropout(self.dropout)(h_path, deterministic=deterministic)
        scores = GatedAttention(dim_out, dim_out, dropout=self.dropout,
                                dense_init=self.dense_init, name="gate")(
            h_path, deterministic=deterministic)
        attn = masked_softmax(scores[..., 0], mask, axis=-1)
        return jnp.einsum("bn,bnd->bd", attn, h_path)


def _vmap_graph(module: nn.Module, x, edge_index, edge_mask, rev_idx,
                rev_mask, band=None, deterministic=None):
    """Apply a per-graph module across the batch dim with shared params.
    Reverse-table / band operands are trailing positionals (None = absent,
    mapped with axis None so the pytree stays empty); `deterministic` is
    forwarded as a kwarg when given (GENConv) and omitted for modules that
    carry it as a static field (DeepGCNBlock under remat)."""
    operands = (x, edge_index, edge_mask, rev_idx, rev_mask)
    if band is not None:
        operands += (band,)
    axes = tuple(0 if op is not None else None for op in operands)
    kw = {} if deterministic is None else {"deterministic": deterministic}
    return nn.vmap(
        lambda m, *a: m(*a, **kw),
        in_axes=axes, out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False, "dropout": True},
    )(module, *operands)


class DualTransHS(nn.Module):
    """Transformer-based ESAT (reference model/backbone.py:171-196):
    4x4-region avg-pool patch embedding -> optional 2-D sin-cos positional
    embedding -> 1-layer transformer encoder -> global attention pooling."""
    dims: Sequence[int]
    nhead: int = 8
    num_layers: int = 1
    emb_ksize: int = 1
    emb_backbone: str = "avgpool"   # 'avgpool' | 'gapool'
    tra_backbone: str = "Transformer"  # 'Transformer' | 'Identity'
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER
    use_pallas: bool = True
    use_fused_embed: bool = False
    use_lnpool: bool = True
    flash_min_len: int = 512

    @nn.compact
    def __call__(self, x, mask, extra=None, *, deterministic: bool):
        dim_in, dim_hid, dim_out = self.dims
        assert dim_hid == dim_out
        emb = make_embedding_layer(self.emb_backbone, dim_in, dim_hid,
                                   ksize=self.emb_ksize,
                                   use_fused=self.use_fused_embed,
                                   use_lnpool=self.use_lnpool,
                                   name="patch_embedding")(
            x, mask, deterministic=deterministic)        # [B, L, hid]
        rmask = region_mask_from_patch_mask(mask)        # [B, L]
        if extra is not None:                            # region coords [B, L, 2]
            pe = compute_pe(extra, ndim=dim_hid, dtype=emb.dtype)
            emb = emb + pe * rmask[..., None].astype(emb.dtype)
        h = emb
        # 'Identity' skips the encoder entirely (reference
        # model/backbone_utils.py:113-127 make_transformer_layer)
        assert self.tra_backbone in ("Transformer", "Identity")
        n_layers = self.num_layers if self.tra_backbone == "Transformer" else 0
        for i in range(n_layers):
            h = TransformerEncoderLayer(dim_hid, self.nhead, dim_hid,
                                        dropout=self.dropout, dense_init=self.dense_init,
                                        use_pallas=self.use_pallas,
                                        flash_min_len=self.flash_min_len,
                                        name=f"encoder_{i}")(
                h, rmask, deterministic=deterministic)
        return GAPool(dim_out, dim_out, dropout=self.dropout, dense_init=self.dense_init,
                      name="pool")(h, rmask, deterministic=deterministic)


def load_backbone(mode: str, dims: Sequence[int], dense_init: str = DenseInit.XAVIER,
                  use_pallas: bool = True, num_graph_layers: int = 1,
                  use_fused_embed: bool = False,
                  use_lnpool: bool = True,
                  tra_backbone: str = "Transformer",
                  flash_min_len: int = 512,
                  grid_resident: bool = False) -> nn.Module:
    """Backbone factory with the reference's default hyperparameters
    (reference model/backbone.py:19-51)."""
    dims = list(dims)[:3]
    if mode == "patch":
        return DualTransHS(dims, nhead=8, num_layers=1, emb_ksize=1,
                           tra_backbone=tra_backbone,
                           dropout=0.25, dense_init=dense_init,
                           use_pallas=use_pallas, use_fused_embed=use_fused_embed,
                           use_lnpool=use_lnpool,
                           flash_min_len=flash_min_len)
    if mode == "cluster":
        return DeepAttnMISL(dims, num_clusters=8, dropout=0.25, dense_init=dense_init)
    if mode == "graph":
        return PatchGCN(dims, num_layers=num_graph_layers, dropout=0.25,
                        dense_init=dense_init, use_pallas=use_pallas,
                        grid_resident=grid_resident)
    return ABMIL(dims, dropout=0.25, dense_init=dense_init)
