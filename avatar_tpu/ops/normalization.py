"""Normalization primitives.

Numerics match the reference stack: diffusers ``RMSNorm`` (fp32 variance,
cast back), ``nn.LayerNorm`` (fp32 stats), and the LTX VAE's ``PixelNorm``
(`/root/reference/ltx_video/models/autoencoders/pixel_norm.py:5-12`).
All are pure functions over explicit weight arrays (None = no affine).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    axis: int = -1,
) -> jnp.ndarray:
    """RMS norm with fp32 accumulation (diffusers RMSNorm semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=axis, keepdims=True)
    out = (xf * (var + eps) ** -0.5).astype(dtype)
    if weight is not None:
        # cast the scale: f32 master weights must not promote bf16
        # activations (doubles every downstream tensor)
        out = out * weight.astype(dtype)
    return out


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    axis: int = -1,
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics over ``axis``."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
    out = (xf - mean) * (var + eps) ** -0.5
    out = out.astype(dtype)
    if weight is not None:
        out = out * weight.astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def pixel_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """x / sqrt(mean(x^2, channel) + eps).

    The reference normalizes over the channel dim (dim=1 in NCFHW); we use
    channels-last layouts, so the default axis is -1.

    Statistics accumulate in f32 (the reduce fuses the upcast), but the
    normalizing multiply runs in the activation dtype: materializing an f32
    copy of the full activation cost ~9 ms per 97-frame VAE decode on v5e.
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps).astype(x.dtype)
