"""Shared flax layers: gated attention, global attention pooling, region patch
embedding, masked transformer encoder, and the noise-MLP generator head.

Architecture parity targets (reference model/backbone_utils.py:11-202,
model/model_utils.py:103-210), re-expressed as batched masked modules:
every instance-axis softmax/mean takes a mask so padded bags compute exactly
the unpadded result.

Initialization parity: the reference applies xavier-uniform/zero-bias to
nn.Linear in the generator (reference model/model_utils.py:12-17, applied at
model/model_handler.py:81) while the discriminator and all Conv2d layers keep
torch defaults (kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for both
weight and bias). ``DenseInit`` selects among these.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.masked import masked_softmax, masked_mean

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(+-1/sqrt(fan_in)). shape = (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def pt041_kernel_init(key, shape, dtype=jnp.float32):
    """pytorch-0.4.1-style init used for Cox baselines: U(+-0.5/sqrt(fan_in))
    (reference model/model_utils.py:53-57)."""
    fan_in = shape[0]
    bound = 0.5 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def pt041_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 0.5 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class DenseInit:
    """Named init schemes for Dense layers."""
    XAVIER = "xavier"        # xavier-uniform kernel, zero bias (generator nets)
    TORCH = "torch"          # torch Linear/Conv2d default (discriminator nets)
    PT041 = "pt041"          # 0.4.1-era uniform (Cox baselines)


# Mixed-precision switch: bf16 activations/compute with f32 params halve the
# HBM traffic of this bandwidth-bound workload. Read at module construction
# (trace time); set via set_compute_dtype BEFORE building/tracing models.
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(precision: str):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.bfloat16 if precision in ("bf16", "bfloat16") else jnp.float32


def compute_dtype():
    return _COMPUTE_DTYPE


# Instance (sequence) parallelism registry: when the handler builds a 2-D
# data x inst mesh it registers it here (same trace-time-global pattern as
# the compute dtype above), and _masked_mha routes long-bag attention through
# the shard_map'd flash wrapper (ops/attention.masked_flash_attention_inst)
# instead of forfeiting the kernel. None = no instance sharding.
_INST_MESH = None


def set_inst_mesh(mesh):
    global _INST_MESH
    _INST_MESH = mesh


def inst_mesh():
    return _INST_MESH


# ---------------------------------------------------------------------------
# Dropout with u8 mask bits under the rbg PRNG regime
# ---------------------------------------------------------------------------

def _rbg_bits(rng) -> bool:
    """True when `rng` draws bits from the rbg-family hardware generator.

    Typed keys carry their own impl; raw uint32 keys are consumed under the
    jax_default_prng_impl in force at trace time (what apply_rng_impl set).
    A typed key's impl lookup is authoritative — if it ever raises we fail
    loudly rather than misrouting a pinned threefry key to the u8 path."""
    try:
        typed = jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
    except Exception:
        typed = False
    if typed:
        return "rbg" in str(jax.random.key_impl(rng))
    return "rbg" in str(jax.config.jax_default_prng_impl)


_DROPOUT_U8 = False  # round-5 default: flax-style bernoulli masks
#                      everywhere. True = u8 byte masks under rbg+f32 only
#                      (legacy auto), "always" = u8 under any impl/dtype
#                      (bench override). The shipped-regime matrix pinned
#                      u8 bytes x the TPU hardware RngBitGenerator as an
#                      ESAT accuracy regression (worst under bf16, -0.05
#                      val C-index; borderline under f32) while
#                      threefry-generated u8 bytes are healthy — see
#                      BENCHNOTES.md round 5.


def set_dropout_u8(enabled):
    global _DROPOUT_U8
    _DROPOUT_U8 = enabled if enabled == "always" else bool(enabled)


def mask_dropout(rng, rate: float, x):
    """Dropout core: zero each element with probability ~rate, scale the rest.

    Default path: flax-style bernoulli(u32) masks under every PRNG impl —
    under the shipped `rng_impl: rbg` the mask BITS still come from the TPU
    hardware generator (the round-4 ~21% win), and the threefry regime stays
    bitwise-identical to flax (every recorded parity artifact).

    Optional u8 byte masks (`set_dropout_u8`): 4x less mask HBM traffic,
    drop probability quantized to round(rate*256)/256 (within 1/512 of
    nominal; the inverse scale uses the QUANTIZED rate so E[out] == x for
    the rate applied). Worth ~7% on the bf16 headline — but the round-5
    shipped-regime matrix pinned u8 bytes FROM THE HARDWARE RngBitGenerator
    as a real accuracy regression on the ESAT arm (-0.05 val C-index under
    bf16, borderline under f32; threefry-generated u8 bytes are healthy),
    so the byte path is opt-in, not the default (BENCHNOTES.md round 5).
    """
    thresh = int(round(rate * 256))  # drop when bits < thresh
    # opt-in ladder (see _DROPOUT_U8): "always" forces byte masks anywhere;
    # True restores the legacy auto path (bytes only under rbg keys AND f32
    # compute — the least-damaged pairing short of off); False (default)
    # never takes the byte path
    u8_ok = (x.dtype == jnp.float32) or _DROPOUT_U8 == "always"
    if 0 < thresh < 256 and (_DROPOUT_U8 == "always"
                             or (_DROPOUT_U8 and u8_ok and _rbg_bits(rng))):
        rate_q = thresh / 256.0
        bits = jax.random.bits(rng, x.shape, jnp.uint8)
        keep = bits >= jnp.uint8(thresh)
        return jnp.where(keep, x / jnp.asarray(1.0 - rate_q, x.dtype),
                         jnp.zeros((), x.dtype))
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                     jnp.zeros((), x.dtype))


class Dropout(nn.Module):
    """nn.Dropout drop-in routing through mask_dropout (u8 bits under rbg)."""
    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        return mask_dropout(self.make_rng(self.rng_collection), self.rate, x)


def make_dense(features: int, dense_init: str = DenseInit.XAVIER, use_bias: bool = True,
               name: str | None = None, in_features: int | None = None) -> nn.Dense:
    dt = compute_dtype()
    if dense_init == DenseInit.XAVIER:
        return nn.Dense(features, use_bias=use_bias, name=name, dtype=dt,
                        kernel_init=nn.initializers.xavier_uniform(),
                        bias_init=nn.initializers.zeros)
    if dense_init == DenseInit.TORCH:
        assert in_features is not None, "torch init needs fan_in for the bias"
        return nn.Dense(features, use_bias=use_bias, name=name, dtype=dt,
                        kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init_for(in_features))
    if dense_init == DenseInit.PT041:
        assert in_features is not None
        return nn.Dense(features, use_bias=use_bias, name=name, dtype=dt,
                        kernel_init=pt041_kernel_init,
                        bias_init=pt041_bias_init_for(in_features))
    raise ValueError(f"unknown dense init {dense_init}")


# ---------------------------------------------------------------------------
# MLP building blocks (reference model/model_utils.py:157-186)
# ---------------------------------------------------------------------------

class MLPBlock(nn.Module):
    """Dense (+LayerNorm) + ReLU + Dropout (reference make_mlp_layer)."""
    dim_in: int
    dim_out: int
    layer_norm: bool = False
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = make_dense(self.dim_out, self.dense_init, in_features=self.dim_in)(x)
        if self.layer_norm:
            x = nn.LayerNorm(dtype=compute_dtype())(x)
        x = nn.relu(x)
        x = Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class BottleneckMLP(nn.Module):
    """Dense(d -> d/2) + ReLU + Dropout + Dense(d/2 -> d)
    (reference make_efficient_mlp_layer, model/model_utils.py:157-166)."""
    dim: int
    dropout: float = 0.25
    dense_init: str = DenseInit.TORCH

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        h = make_dense(self.dim // 2, self.dense_init, in_features=self.dim)(x)
        h = nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        h = make_dense(self.dim, self.dense_init, in_features=self.dim // 2)(h)
        return h


# ---------------------------------------------------------------------------
# Attention pooling (reference model/backbone_utils.py:11-56)
# ---------------------------------------------------------------------------

class GatedAttention(nn.Module):
    """Attention scores with sigmoid gating: A = Dense1(tanh(a) * sigmoid(b)).

    Input [..., N, L] -> scores [..., N, n_classes]; caller applies the masked
    softmax over N (reference Attn_Net_Gated).
    """
    dim_l: int
    dim_d: int
    dropout: float = 0.25
    n_classes: int = 1
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        a = jnp.tanh(make_dense(self.dim_d, self.dense_init, in_features=self.dim_l,
                                name="attention_a")(x))
        b = nn.sigmoid(make_dense(self.dim_d, self.dense_init, in_features=self.dim_l,
                                  name="attention_b")(x))
        if self.dropout:
            a = Dropout(0.25)(a, deterministic=deterministic)
            b = Dropout(0.25)(b, deterministic=deterministic)
        scores = make_dense(self.n_classes, self.dense_init, in_features=self.dim_d,
                            name="attention_c")(a * b)
        return scores


class GAPool(nn.Module):
    """Global attention pooling [B, N, d] -> [B, d] (reference GAPool).

    emb = Dropout(tanh(Dense(x))); scr = Dropout(sigmoid(Dense(x)));
    attn = masked_softmax(Dense1(emb * scr)) over N; out = attn @ x.
    """
    in_dim: int
    hid_dim: int
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        emb = jnp.tanh(make_dense(self.hid_dim, self.dense_init, in_features=self.in_dim,
                                  name="fc1")(x))
        emb = Dropout(self.dropout)(emb, deterministic=deterministic)
        scr = nn.sigmoid(make_dense(self.hid_dim, self.dense_init, in_features=self.in_dim,
                                    name="score")(x))
        scr = Dropout(self.dropout)(scr, deterministic=deterministic)
        rep = make_dense(1, self.dense_init, in_features=self.hid_dim, name="fc2")(emb * scr)
        attn = masked_softmax(rep[..., 0], mask, axis=-1)  # [B, N]
        return jnp.einsum("bn,bnd->bd", attn, x)


# ---------------------------------------------------------------------------
# Region patch embedding (reference AVGPoolPatchEmbedding,
# model/backbone_utils.py:129-168)
# ---------------------------------------------------------------------------

class AvgPoolPatchEmbedding(nn.Module):
    """[B, N, C] -> [B, N/16, out_dim]: per-patch conv/FC + LN + ReLU, then
    average pooling over each 4x4 region of 16 consecutive patches.

    ksize=1 is a pointwise Dense; ksize=3 convolves over the 4x4 grid each
    region forms (stride 1, same padding). Padded patches (mask=0) are excluded
    from the average; with whole-region padding this matches the reference's
    AdaptiveAvgPool2d over exact bags.
    """
    in_dim: int
    out_dim: int
    scale: int = 4
    ksize: int = 1
    dense_init: str = DenseInit.TORCH  # Conv2d keeps torch default in the reference
    use_fused: bool = False  # fused Pallas Dense+LN+ReLU+region-mean kernel
    use_lnpool: bool = True  # fused Pallas LN+ReLU+region-mean (matmul in XLA)

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        B, N, C = x.shape
        s2 = self.scale * self.scale
        L = N // s2
        if self.ksize == 1 and self.use_fused and s2 == 16:
            from ..ops.fused_embed import fused_region_embedding
            from ..ops.attention import pallas_available
            dense = make_dense(self.out_dim, self.dense_init,
                               in_features=self.in_dim, name="Dense_0")
            ln = nn.LayerNorm(dtype=compute_dtype(), name="LayerNorm_0")
            # touch the submodules on a 1-patch slice so their params exist
            # under the same names as the unfused path (checkpoint compatible);
            # the dummy results are dead code after DCE
            _ = ln(dense(x[:, :1]))
            if pallas_available():
                w = dense.variables["params"]["kernel"]
                bb = dense.variables["params"]["bias"]
                sc = ln.variables["params"]["scale"]
                bi = ln.variables["params"]["bias"]
                out = fused_region_embedding(x.reshape(B * N, C), w, bb, sc, bi)
                out = out.reshape(B, L, self.out_dim)
                rmask = jnp.any(mask.reshape(B, L, s2).astype(bool), axis=-1)
                return out * rmask[..., None].astype(out.dtype)
            h = nn.relu(ln(dense(x)))
            h = h.reshape(B, L, s2, self.out_dim)
            m = mask.reshape(B, L, s2)
            return masked_mean(h, m[..., None], axis=-2)
        if self.ksize == 1:
            h = make_dense(self.out_dim, self.dense_init, in_features=self.in_dim)(x)
        else:
            # conv over each region's 4x4 grid: [B*L, 4, 4, C] -> same spatial
            h = x.reshape(B * L, self.scale, self.scale, C)
            h = nn.Conv(self.out_dim, kernel_size=(self.ksize, self.ksize),
                        padding="SAME",
                        kernel_init=torch_linear_kernel_init_conv(self.in_dim * self.ksize ** 2),
                        bias_init=torch_linear_bias_init_for(self.in_dim * self.ksize ** 2))(h)
            h = h.reshape(B, N, self.out_dim)
        ln = nn.LayerNorm(dtype=compute_dtype())
        from ..ops.attention import pallas_available
        if (self.use_lnpool and s2 == 16 and self.out_dim % 128 == 0
                and pallas_available()):
            # LN+ReLU+region-mean in one Pallas pass (ops/ln_pool.py): the
            # profiled LayerNorm chains are HBM-bound under XLA, and the
            # pooled output is 16x smaller than the normalized activation.
            # The dummy call creates the LN params under the unfused path's
            # name (checkpoint compatible); dead code after DCE.
            from ..ops.ln_pool import ln_relu_region_mean
            _ = ln(h[:, :1])
            sc = ln.variables["params"]["scale"]
            bi = ln.variables["params"]["bias"]
            out = ln_relu_region_mean(h.reshape(B * N, self.out_dim), sc, bi)
            out = out.reshape(B, L, self.out_dim)
            rmask = jnp.any(mask.reshape(B, L, s2).astype(bool), axis=-1)
            return out * rmask[..., None].astype(out.dtype)
        h = ln(h)
        h = nn.relu(h)
        # masked average over the 16 patches of each region
        h = h.reshape(B, L, s2, self.out_dim)
        m = mask.reshape(B, L, s2)
        return masked_mean(h, m[..., None], axis=-2)  # [B, L, out_dim]


def torch_linear_kernel_init_conv(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class GAPoolPatchEmbedding(nn.Module):
    """Alternative patch embedding pooling each 4x4 region with global
    attention instead of an average (reference GAPoolPatchEmbedding,
    model/backbone_utils.py:171-202; unused in the default config but part of
    make_embedding_layer's surface)."""
    in_dim: int
    out_dim: int
    scale: int = 4
    ksize: int = 1
    dense_init: str = DenseInit.TORCH

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        B, N, C = x.shape
        s2 = self.scale * self.scale
        L = N // s2
        if self.ksize == 1:
            h = make_dense(self.out_dim, self.dense_init, in_features=self.in_dim)(x)
        else:
            h = x.reshape(B * L, self.scale, self.scale, C)
            h = nn.Conv(self.out_dim, kernel_size=(self.ksize, self.ksize),
                        padding="SAME",
                        kernel_init=torch_linear_kernel_init_conv(self.in_dim * self.ksize ** 2),
                        bias_init=torch_linear_bias_init_for(self.in_dim * self.ksize ** 2))(h)
            h = h.reshape(B, N, self.out_dim)
        h = nn.LayerNorm(dtype=compute_dtype())(h)
        h = nn.relu(h)
        h = h.reshape(B * L, s2, self.out_dim)
        m = mask.reshape(B * L, s2)
        pooled = GAPool(self.out_dim, self.out_dim, dropout=0.0,
                        dense_init=self.dense_init, name="pool")(
            h, m, deterministic=deterministic)
        return pooled.reshape(B, L, self.out_dim)


def make_embedding_layer(backbone: str, in_dim: int, out_dim: int,
                         ksize: int = 1, dense_init: str = DenseInit.TORCH,
                         name: str | None = None,
                         use_fused: bool = False,
                         use_lnpool: bool = True) -> nn.Module:
    """Embedding-layer factory (reference make_embedding_layer,
    model/backbone_utils.py:101-111)."""
    if backbone == "gapool":
        return GAPoolPatchEmbedding(in_dim, out_dim, ksize=ksize,
                                    dense_init=dense_init, name=name)
    if backbone == "avgpool":
        return AvgPoolPatchEmbedding(in_dim, out_dim, ksize=ksize,
                                     dense_init=dense_init, name=name,
                                     use_fused=use_fused,
                                     use_lnpool=use_lnpool)
    raise NotImplementedError(f"{backbone} has not implemented.")


class NoisePerturbationLayer(nn.Module):
    """Concat same-shaped noise then Dense+LN+Dropout back to in_dim
    (reference NoisePerturbationLayer, model/model_utils.py:135-152; an
    alternative noise-injection layer kept for surface parity)."""
    in_channels: int
    noise_dist: str = "uniform"
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        rng = self.make_rng("noise")
        if self.noise_dist == "uniform":
            noise = jax.random.uniform(rng, x.shape, x.dtype)
        else:
            noise = jax.random.normal(rng, x.shape, x.dtype)
        data = jnp.concatenate([x, noise], axis=-1)
        h = make_dense(self.in_channels, self.dense_init,
                       in_features=2 * self.in_channels)(data)
        h = nn.LayerNorm(dtype=compute_dtype())(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        return h


# ---------------------------------------------------------------------------
# Masked transformer encoder (reference make_transformer_layer,
# model/backbone_utils.py:113-127; torch TransformerEncoderLayer post-LN)
# ---------------------------------------------------------------------------

class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer, relu activation, masked attention.

    Matches torch.nn.TransformerEncoderLayer(d_model, nhead,
    dim_feedforward=d_model, dropout, activation='relu', batch_first=True,
    norm_first=False) with a key-padding mask.
    """
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.25
    dense_init: str = DenseInit.XAVIER
    use_pallas: bool = True
    flash_min_len: int = 512

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool):
        B, L, D = x.shape
        H = self.nhead
        Dh = D // H
        # in-projection: torch MultiheadAttention xavier-uniform over the packed
        # (3D, D) matrix; separate xavier per-slice is the same distribution
        qkv = make_dense(3 * D, DenseInit.XAVIER, in_features=D, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, Dh)
        k = k.reshape(B, L, H, Dh)
        v = v.reshape(B, L, H, Dh)
        attn = _masked_mha(q, k, v, mask, self.dropout, deterministic, self,
                           use_pallas=self.use_pallas,
                           flash_min_len=self.flash_min_len)
        attn = attn.reshape(B, L, D)
        attn = make_dense(D, self.dense_init, in_features=D, name="out_proj")(attn)
        x = x + Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=compute_dtype(), name="norm1")(x)
        ff = make_dense(self.dim_feedforward, self.dense_init, in_features=D, name="linear1")(x)
        ff = nn.relu(ff)
        ff = Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = make_dense(D, self.dense_init, in_features=self.dim_feedforward, name="linear2")(ff)
        x = x + Dropout(self.dropout)(ff, deterministic=deterministic)
        x = nn.LayerNorm(dtype=compute_dtype(), name="norm2")(x)
        # zero out padded positions so downstream pools see clean zeros
        return x * mask[..., None].astype(x.dtype)


def _masked_mha(q, k, v, mask, dropout, deterministic, module: nn.Module,
                use_pallas: bool, flash_min_len: int = 512):
    """Multi-head attention with key-padding mask.

    q,k,v: [B, L, H, Dh]; mask: [B, L] (1 = real). Uses the Pallas flash
    kernel on TPU once the (padded) region count reaches ``flash_min_len``
    (the measured crossover vs the materializing einsum — see BENCHNOTES),
    jnp einsum otherwise. The flash path is fully differentiable (custom
    VJP) and applies attention-probability dropout inside the kernel via
    the TPU core PRNG, so it serves training as well as eval.
    """
    B, L, H, Dh = q.shape
    scale = 1.0 / jnp.sqrt(Dh).astype(q.dtype)
    if use_pallas:
        from ..ops.attention import (masked_flash_attention, pallas_available,
                                     flash_force_interpret)
        # measured crossovers (BENCHNOTES r3, scripts/bench_flash_crossover):
        # training (fwd+bwd+dropout) flash wins from ~L=512; the eval-only
        # forward stays einsum-faster until ~L=2048, so the deterministic
        # path gates 4x higher (O(L^2) logits memory still bounds both)
        min_len = flash_min_len if not deterministic \
            else max(flash_min_len, 2048)
        if (pallas_available() or flash_force_interpret()) and L >= min_len:
            seed = None
            p = 0.0
            if dropout and not deterministic:
                rng = module.make_rng("dropout")
                seed = jax.random.randint(rng, (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
                p = dropout
            mesh = inst_mesh()
            if mesh is not None:
                # sequence-parallel flash: local Q rows, all-gathered K/V,
                # dK/dV reduce-scattered by the all-gather transpose
                from ..ops.attention import masked_flash_attention_inst
                return masked_flash_attention_inst(q, k, v, mask, mesh,
                                                   dropout_p=p, seed=seed)
            return masked_flash_attention(q, k, v, mask, dropout_p=p,
                                          seed=seed)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked queries would softmax over all -inf -> uniform garbage;
    # their outputs are zeroed by the caller via the mask
    if dropout and not deterministic:
        probs = mask_dropout(module.make_rng("dropout"), dropout, probs)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Noise-MLP generator head (reference make_noise_mlp_layer,
# model/model_utils.py:106-133; Generator.forward model/GANSurv.py:30-49)
# ---------------------------------------------------------------------------

def get_hop_dims(d: int, hops: int) -> list:
    res, cur = [], d
    for _ in range(hops):
        cur = cur // 2
        if cur > 1:
            res.append(cur)
        else:
            break
    return res


class NoiseMLPHead(nn.Module):
    """MLP head with optional per-layer noise concatenation.

    Layer i input dim doubles when noise[i] == 1 (a noise tensor with H's shape
    is concatenated). Hidden dims are successive halvings of dim_in for
    ``hops`` steps; the final layer is a bare Dense.
    """
    dim_in: int
    dim_out: int
    noise: Sequence[int]
    hops: int = 1
    norm: bool = False
    dropout: float = 0.25
    noise_dist: str = "uniform"
    dense_init: str = DenseInit.XAVIER

    @nn.compact
    def __call__(self, h, *, zero_noise: bool, deterministic: bool):
        hid_dims = get_hop_dims(self.dim_in, self.hops)
        num_layers = len(hid_dims) + 1
        in_dims = [self.dim_in] + hid_dims
        out_dims = hid_dims + [self.dim_out]
        assert len(self.noise) == self.hops + 1
        for i in range(num_layers):
            if self.noise[i] == 1:
                if zero_noise:
                    noise = jnp.zeros_like(h)
                else:
                    rng = self.make_rng("noise")
                    if self.noise_dist == "uniform":
                        noise = jax.random.uniform(rng, h.shape, h.dtype)
                    elif self.noise_dist == "gaussian":
                        noise = jax.random.normal(rng, h.shape, h.dtype)
                    else:
                        raise NotImplementedError(self.noise_dist)
                data = jnp.concatenate([h, noise], axis=-1)
                fan_in = in_dims[i] * 2
            else:
                data = h
                fan_in = in_dims[i]
            if i == num_layers - 1:
                h = make_dense(out_dims[i], self.dense_init, in_features=fan_in,
                               name=f"mlp_{i}")(data)
            else:
                h = MLPBlock(fan_in, out_dims[i], layer_norm=self.norm,
                             dropout=self.dropout, dense_init=self.dense_init,
                             name=f"mlp_{i}")(data, deterministic=deterministic)
        return h


def apply_out_scale(h, out_scale: str):
    h = h.astype(jnp.float32)  # predictions/losses stay f32 under bf16 compute
    if out_scale == "sigmoid":
        return nn.sigmoid(h)
    if out_scale == "exp":
        return jnp.exp(h)
    return h
