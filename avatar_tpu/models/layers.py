"""Shared functional layer primitives over explicit parameter pytrees.

Conventions (used across the whole framework):
- linear params:  {"kernel": [in, out], "bias": [out]?}         (torch .weight is transposed at import)
- conv3d params:  {"kernel": [kt, kh, kw, in, out], "bias": [out]?}
- norm params:    {"scale": [C]?, "bias": [C]?}
- modules are pure `apply(params, ...)` functions; `init_*` builds params.

Initializers follow torch defaults (kaiming-uniform fan_in for weights,
uniform(+-1/sqrt(fan_in)) for biases) so from-scratch training behaves like
the reference; imported checkpoints overwrite these anyway.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {
        "kernel": jax.random.uniform(
            kw, (in_dim, out_dim), dtype, -math.sqrt(3) * bound, math.sqrt(3) * bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(params: dict, x) -> jnp.ndarray:
    from avatar_tpu.ops.int8_matmul import PrequantRows

    if isinstance(x, PrequantRows):
        # Rows already int8-quantized by a fused producer kernel
        # (ops/int8_matmul.fused_rms_mod_quant / fused_geglu_quant) —
        # straight to the in-register-dequant matmul.
        from avatar_tpu.ops.int8_matmul import w8a8_matmul

        assert "kernel_q8" in params, "prequant input needs w8a8 params"
        out2d = w8a8_matmul(
            x.q, x.s, params["kernel_q8"],
            params["scale"], bias=params.get("bias"), out_dtype=x.dtype,
        )
        return out2d.reshape(*x.shape[:-1], out2d.shape[-1])
    if "kernel_q8" in params:
        # W8A8 (utils/quantize.py): dynamic per-token activation quant +
        # int8 x int8 dot on the MXU's 2x-rate int8 mode, dequant fused
        # into the epilogue. Identical quants of a shared input (q/k/v off
        # one norm) are CSE'd by XLA, so the row-max costs once. Short
        # sequences keep the plain XLA dot (epilogue fusion wins there);
        # PER-SAMPLE seq len >= W8A8_PALLAS_MIN_TOKENS routes to the Pallas
        # in-register-dequant kernel (ops/int8_matmul.py) — at those sizes
        # XLA materializes the int32 accumulators in HBM. The breakdown is
        # a per-sequence effect: batching 832-token samples does NOT
        # reproduce it (measured through b4 = 3328 total tokens, r5), so
        # routing keys on x.shape[-2], not the flattened row count — see
        # the threshold note in ops/int8_matmul.py.
        w_q = params["kernel_q8"]
        m = 1
        for dim in x.shape[:-1]:
            m *= int(dim)
        seq = int(x.shape[-2]) if x.ndim >= 2 else m
        from avatar_tpu.ops.attention import tpu_backend
        from avatar_tpu.ops.int8_matmul import W8A8_PALLAS_MIN_TOKENS

        if seq >= W8A8_PALLAS_MIN_TOKENS and tpu_backend():
            # Long sequences: XLA stops fusing both the activation-quant
            # passes and the dequant of the int32 accumulators (~15 GB/step
            # of HBM round-trips at 5376 tokens) — run a single-pass Pallas
            # row quant + in-register-dequant int8 matmul instead. At short
            # lengths (832-token serving point) XLA's fusion wins — keep
            # the plain dot below (see ops/int8_matmul.py).
            from avatar_tpu.ops.int8_matmul import (
                quantize_rows_pallas,
                w8a8_matmul,
            )

            x_q2, x_s2 = quantize_rows_pallas(x.reshape(m, x.shape[-1]))
            out2d = w8a8_matmul(
                x_q2, x_s2, w_q,
                params["scale"], bias=params.get("bias"), out_dtype=x.dtype,
            )
            return out2d.reshape(*x.shape[:-1], out2d.shape[-1])
        # Row max on x's own dtype: abs-max is a selection, so bf16 loses
        # nothing that matters for a quant scale, and keeping the f32 cast
        # single-consumer lets XLA fuse it into the quant pass instead of
        # materializing a f32 copy of every block input (was ~457 us/step
        # of convert_element_type at the 832-token operating point).
        x_s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(
            jnp.float32) / 127.0
        x_s = jnp.maximum(x_s, 1e-30)
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / x_s)), -127, 127
        ).astype(jnp.int8)
        acc = jnp.einsum(
            "...i,io->...o", x_q, w_q,
            preferred_element_type=jnp.int32,
        )
        out = (acc.astype(jnp.float32) * x_s * params["scale"]).astype(x.dtype)
    else:
        if "kernel_q" in params:
            # weight-only int8 (utils/quantize.py): dequant fuses into the
            # matmul's weight read, halving HBM traffic
            kernel = params["kernel_q"].astype(x.dtype) * params[
                "scale"
            ].astype(x.dtype)
        else:
            kernel = params["kernel"].astype(x.dtype)
        out = jnp.einsum("...i,io->...o", x, kernel)
    if "bias" in params:
        out = out + params["bias"].astype(out.dtype)
    return out


def init_conv3d(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel_size: int = 3,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size**3
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "kernel": jax.random.uniform(
            kw,
            (kernel_size, kernel_size, kernel_size, in_ch, out_ch),
            dtype,
            -math.sqrt(3) * bound,
            math.sqrt(3) * bound,
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def group_norm(
    params: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-6
) -> jnp.ndarray:
    """GroupNorm over channels-last x: [..., C]."""
    c = x.shape[-1]
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(x.shape[0], -1, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    out = xf.reshape(x.shape).astype(dtype)
    if "scale" in params:
        out = out * params["scale"].astype(dtype)
    if "bias" in params:
        out = out + params["bias"].astype(dtype)
    return out


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """DDPM sinusoidal embedding (reference embeddings.py:10-50; defaults match
    diffusers' ``Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)``
    used by PixArt-style conditioning)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_timestep_embedder(
    key: jax.Array, dim: int, freq_dim: int = 256, dtype: jnp.dtype = jnp.float32
) -> dict:
    """PixArtAlphaCombinedTimestepSizeEmbeddings params: 2-layer MLP over the
    256-d sinusoidal embedding (torch keys *.timestep_embedder.linear_{1,2})."""
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, freq_dim, dim, dtype=dtype),
        "linear_2": init_linear(k2, dim, dim, dtype=dtype),
    }


def timestep_embedder(
    params: dict,
    timesteps: jnp.ndarray,
    freq_dim: int = 256,
    dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """timestep [B] (or flattened [B*N]) -> [B, dim] embedding."""
    emb = sinusoidal_timestep_embedding(timesteps, freq_dim)
    if dtype is not None:
        emb = emb.astype(dtype)
    h = linear(params["linear_1"], emb)
    h = jax.nn.silu(h)
    return linear(params["linear_2"], h)
