"""2-D sin-cos positional embedding for region coordinates
(reference model/backbone_utils.py:79-99)."""
from __future__ import annotations

import jax.numpy as jnp


def posemb_sincos_2d(y, x, dim: int, temperature: float = 10000.0,
                     dtype=jnp.float32):
    """y, x: [..., L] coordinates -> [..., L, dim]; dim % 4 == 0."""
    assert dim % 4 == 0, "feature dimension must be multiple of 4 for sincos emb"
    omega = jnp.arange(dim // 4, dtype=jnp.float32) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = y[..., None].astype(jnp.float32) * omega
    x = x[..., None].astype(jnp.float32) * omega
    pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=-1)
    return pe.astype(dtype)


def to_relative_coord(coord):
    """coord [..., L, 2] -> coords shifted so the min corner is the origin
    (reference utils/func.py:275-280)."""
    ref_xy = jnp.min(coord, axis=-2, keepdims=True)
    return coord - ref_xy


def compute_pe(coord, ndim: int = 384, step: int = 1, dtype=jnp.float32):
    """Region coords [B, L, 2] -> positional embedding [B, L, ndim]
    (reference model/backbone_utils.py:90-99)."""
    ncoord = to_relative_coord(coord)
    y = ncoord[..., 1] // step
    x = ncoord[..., 0] // step
    return posemb_sincos_2d(y, x, ndim, dtype=dtype)
