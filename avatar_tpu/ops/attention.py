"""Attention dispatch: Pallas TPU flash attention with an XLA fallback.

Replaces the reference's dual backend (torch SDPA / torch_xla Pallas kernel,
`/root/reference/ltx_video/models/transformers/attention.py:1026-1064`).
Here the TPU kernel is the default on TPU backends; the XLA einsum path is
the fallback (CPU tests, tiny shapes, odd head dims) and the numerical
reference for kernel parity tests.

Inputs are [B, H, Lq, D] / [B, H, Lkv, D]; masks are additive biases
broadcastable to [B, H, Lq, Lkv] or boolean keep-masks of shape [B, Lkv].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _mask_to_bias(
    mask: jnp.ndarray, dtype: jnp.dtype, num_dims: int
) -> jnp.ndarray:
    """Convert a [B, Lkv] keep-mask (1=keep) to an additive [B,1,1,Lkv] bias
    (transformer3d.py:432-445 uses -10000 for masked positions)."""
    if mask.dtype == jnp.bool_:
        bias = jnp.where(mask, 0.0, -1e4).astype(jnp.float32)
    else:
        bias = ((1.0 - mask.astype(jnp.float32)) * -1e4)
    while bias.ndim < num_dims:
        bias = bias[:, None]
    return bias


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference einsum attention with fp32 softmax accumulation."""
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=None)
def tpu_backend() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    # Axon-tunneled TPUs report platform "tpu" or the experimental "axon".
    return platform in ("tpu", "axon")


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Multi-head attention over [B, H, L, D] tensors.

    Args:
      mask: None, a [B, Lkv] keep-mask (1/True = attend), or an additive bias
        broadcastable to [B, H, Lq, Lkv].
      impl: 'auto' | 'xla' | 'flash'.  'auto' picks the Pallas kernel on TPU
        when shapes are kernel-friendly, else the XLA path (XLA itself fuses
        this into a reasonable attention on TPU).
      bounded_logits: caller guarantees |logits| << f32 exp limit (true
        after qk-norm) — long sequences take the max-free flash kernel.
    """
    bias = None
    if mask is not None:
        if mask.ndim == 2:
            bias = _mask_to_bias(mask, q.dtype, 4)
        else:
            bias = mask

    if impl == "xla":
        return xla_attention(q, k, v, bias, scale)

    if impl in ("auto", "flash"):
        use_flash = impl == "flash" or tpu_backend()
        if use_flash:
            from avatar_tpu.ops.flash_attention import flash_attention, supports

            if supports(q, k, v) or impl == "flash":
                return flash_attention(q, k, v, bias=bias, scale=scale,
                                       bounded_logits=bounded_logits)
        return xla_attention(q, k, v, bias, scale)

    raise ValueError(f"Unknown attention impl: {impl}")
