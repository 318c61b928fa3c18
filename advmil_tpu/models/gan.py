"""Adversarial networks: Generator, Discriminator, PrjDiscriminator, and the
non-adversarial SurvNet baseline (reference model/GANSurv.py:13-105,
model/BaseSurv.py:10-40, model/model_utils.py:178-210).

Initialization parity: the generator is xavier-initialized (its backbone Dense
layers included), the discriminator keeps torch defaults — see
reference model/model_handler.py:81 (init applied to netG only).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import (DenseInit, GAPool, BottleneckMLP,
                     MLPBlock, NoiseMLPHead, apply_out_scale, make_dense,
                     make_embedding_layer)
from ..ops.masked import masked_mean, region_mask_from_patch_mask


class Generator(nn.Module):
    """backbone -> H [B, d] -> noise-MLP head -> out_scale
    (reference model/GANSurv.py:13-49).

    ``embed`` / ``head`` are exposed separately so test-time K-sample
    prediction (reference's 30x loop, model/model_handler.py:624-641) runs the
    expensive backbone ONCE and vmaps only the tiny noise head over samples.
    """
    backbone: nn.Module
    dim_in: int
    dim_out: int
    noise: Sequence[int]
    hops: int = 1
    noise_dist: str = "uniform"
    norm: bool = False
    dropout: float = 0.25
    out_scale: str = "sigmoid"

    def setup(self):
        self.head_mlp = NoiseMLPHead(self.dim_in, self.dim_out, self.noise,
                                     hops=self.hops, norm=self.norm,
                                     dropout=self.dropout,
                                     noise_dist=self.noise_dist,
                                     dense_init=DenseInit.XAVIER, name="head")

    def embed(self, x, mask, extra=None, *, deterministic: bool = True):
        return self.backbone(x, mask, extra, deterministic=deterministic)

    def head(self, H, *, zero_noise: bool = False, deterministic: bool = True):
        h = self.head_mlp(h=H, zero_noise=zero_noise,
                          deterministic=deterministic)
        return apply_out_scale(h, self.out_scale)

    def __call__(self, x, mask, extra=None, *, zero_noise: bool = False,
                 deterministic: bool = True):
        H = self.embed(x, mask, extra, deterministic=deterministic)
        return self.head(H, zero_noise=zero_noise, deterministic=deterministic)


class EmbedXLayer(nn.Module):
    """Discriminator X tower (reference model/model_utils.py:188-210):
    region avg-pool embedding -> bottleneck fc1 -> GAPool -> bottleneck fc2.
    Returns (bag [B, C'], instances [B, L, C'], region_mask [B, L])."""
    in_dim: int
    out_dim: int
    ksize: int = 1
    dropout: float = 0.25
    backbone: str = "avgpool"  # 'avgpool' | 'gapool' (cfg disc_netx_backbone)
    dense_init: str = DenseInit.TORCH
    use_lnpool: bool = True

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool, emb=None):
        # emb: optionally reuse a previously computed patch embedding — the
        # embedding sub-tower is dropout-free, so a second scoring pass over
        # the same x (the D phase's real/fake pair) can share ONE jaxpr node:
        # the [B,N,in_dim] feats read happens once and the backward sums the
        # pair's cotangents before the feats-reading dW transpose dot
        # (BENCHNOTES round-4 roofline: the split dW was 6% of the step).
        if emb is None:
            emb = make_embedding_layer(self.backbone, self.in_dim,
                                       self.out_dim, ksize=self.ksize,
                                       dense_init=self.dense_init,
                                       use_lnpool=self.use_lnpool,
                                       name="embedding")(
                x, mask, deterministic=deterministic)    # [B, L, C']
        emb_ins = emb
        rmask = region_mask_from_patch_mask(mask)
        fc_ins = BottleneckMLP(self.out_dim, dropout=self.dropout, dense_init=self.dense_init,
                               name="fc1")(emb_ins, deterministic=deterministic)
        emb_bag = GAPool(self.out_dim, self.out_dim, dropout=self.dropout,
                         dense_init=self.dense_init, name="pool")(
            fc_ins, rmask, deterministic=deterministic)  # [B, C']
        fc_bag = BottleneckMLP(self.out_dim, dropout=self.dropout, dense_init=self.dense_init,
                               name="fc2")(emb_bag, deterministic=deterministic)
        return fc_bag, fc_ins, rmask, emb


class EmbedYLayer(nn.Module):
    """Discriminator t tower: MLP in_dim -> hid_dims (reference
    model/model_utils.py:178-186)."""
    in_dim: int
    hid_dims: Sequence[int]
    norm: bool = False
    dropout: float = 0.0
    dense_init: str = DenseInit.TORCH

    @nn.compact
    def __call__(self, t, *, deterministic: bool):
        h = t
        d_in = self.in_dim
        for i, d_out in enumerate(self.hid_dims):
            h = MLPBlock(d_in, d_out, layer_norm=self.norm, dropout=self.dropout,
                         dense_init=self.dense_init, name=f"mlp_{i}")(
                h, deterministic=deterministic)
            d_in = d_out
        return h


class Discriminator(nn.Module):
    """Concat-fusion discriminator (reference model/GANSurv.py:52-68)."""
    netx_in_dim: int
    netx_out_dim: int
    nety_in_dim: int
    nety_hid_dims: Sequence[int]
    netx_ksize: int = 1
    netx_dropout: float = 0.25
    netx_backbone: str = "avgpool"
    nety_norm: bool = False
    nety_dropout: float = 0.0
    use_lnpool: bool = True

    @nn.compact
    def __call__(self, x, t, mask, *, deterministic: bool = True):
        # t may be a tuple (real, fake): same shared-embedding pair contract
        # as PrjDiscriminator (see there)
        ts = t if isinstance(t, tuple) else (t,)
        embX = EmbedXLayer(self.netx_in_dim, self.netx_out_dim,
                           ksize=self.netx_ksize, dropout=self.netx_dropout,
                           backbone=self.netx_backbone,
                           use_lnpool=self.use_lnpool, name="net_pair_one")
        netY = EmbedYLayer(self.nety_in_dim, self.nety_hid_dims,
                           norm=self.nety_norm, dropout=self.nety_dropout,
                           name="net_pair_two")
        d_in = self.netx_out_dim + self.nety_hid_dims[-1]
        fc = make_dense(1, DenseInit.TORCH, in_features=d_in, name="fc")
        outs = []
        emb = None
        for tt in ts:
            hid_t = netY(tt, deterministic=deterministic)
            hid_x, _, _, emb = embX(x, mask, deterministic=deterministic,
                                    emb=emb)
            outs.append(fc(jnp.concatenate([hid_x, hid_t], axis=-1)))
        return outs[0] if not isinstance(t, tuple) else tuple(outs)


class PrjDiscriminator(nn.Module):
    """Projection discriminator (reference model/GANSurv.py:71-105).

    inner_product='bag': score = <hid_x, hid_t>;
    'instance' (RLIP): per-region <emb_ins, hid_t>, masked mean over regions.
    Optional projection residual through hid_x or hid_t.
    """
    netx_in_dim: int
    netx_out_dim: int
    nety_in_dim: int
    nety_hid_dims: Sequence[int]
    prj_path: str = "x"          # 'x' / 'y' / other -> no projection
    inner_product: str = "bag"   # 'bag' / 'instance'
    netx_ksize: int = 1
    netx_dropout: float = 0.25
    netx_backbone: str = "avgpool"
    nety_norm: bool = False
    nety_dropout: float = 0.0
    use_lnpool: bool = True

    @nn.compact
    def __call__(self, x, t, mask, *, deterministic: bool = True):
        assert self.inner_product in ("bag", "instance")
        # t may be a TUPLE (t_real, t_fake): both pairs are scored within one
        # trace, sharing the dropout-free patch-embedding sub-tower (one
        # [B,N,in_dim] feats read forward AND one merged dW backward) while
        # every dropout-carrying layer (fc1/pool/fc2, nety) runs per pair
        # with independent masks — semantically the reference's two separate
        # train-mode netD calls (reference model/model_handler.py:345-352).
        ts = t if isinstance(t, tuple) else (t,)
        embX = EmbedXLayer(
            self.netx_in_dim, self.netx_out_dim, ksize=self.netx_ksize,
            dropout=self.netx_dropout, backbone=self.netx_backbone,
            use_lnpool=self.use_lnpool, name="net_pair_one")
        netY = EmbedYLayer(self.nety_in_dim, self.nety_hid_dims,
                           norm=self.nety_norm, dropout=self.nety_dropout,
                           name="net_pair_two")
        prj = None
        if self.prj_path == "x":
            prj = make_dense(1, DenseInit.TORCH,
                             in_features=self.netx_out_dim, name="prj_layer")
        elif self.prj_path == "y":
            prj = make_dense(1, DenseInit.TORCH,
                             in_features=self.nety_hid_dims[-1],
                             name="prj_layer")
        outs = []
        emb = None
        for tt in ts:
            hid_t = netY(tt, deterministic=deterministic)
            hid_x, emb_ins, rmask, emb = embX(x, mask,
                                              deterministic=deterministic,
                                              emb=emb)
            if self.inner_product == "bag":
                out = jnp.sum(hid_t * hid_x, axis=-1, keepdims=True)  # [B, 1]
            else:
                out_ins = jnp.sum(emb_ins * hid_t[:, None, :], axis=-1)  # [B, L]
                out = masked_mean(out_ins[..., None], rmask[..., None],
                                  axis=-2)                            # [B, 1]
            if self.prj_path == "x":
                out = out + prj(hid_x)
            elif self.prj_path == "y":
                out = out + prj(hid_t)
            outs.append(out)
        return outs[0] if not isinstance(t, tuple) else tuple(outs)


class SurvNet(nn.Module):
    """Baseline survival net: backbone + noise-free MLP head + out scale
    (reference model/BaseSurv.py:10-40)."""
    backbone: nn.Module
    dim_in: int
    dim_out: int
    hops: int = 1
    norm: bool = False
    dropout: float = 0.25
    out_scale: str = "none"
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, mask, extra=None, *, deterministic: bool = True,
                 zero_noise: bool = True):
        H = self.backbone(x, mask, extra, deterministic=deterministic)
        noise = [0] * (1 + self.hops)
        h = NoiseMLPHead(self.dim_in, self.dim_out, noise, hops=self.hops,
                         norm=self.norm, dropout=self.dropout, dense_init=self.dense_init,
                         name="out_layer")(h=H, zero_noise=True,
                                           deterministic=deterministic)
        if self.out_scale == "sigmoid":
            return nn.sigmoid(h)
        return h
