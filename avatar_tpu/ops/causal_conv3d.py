"""Temporally-causal 3D convolution for the LTX video VAE.

Re-design of ``CausalConv3d``
(`/root/reference/ltx_video/models/autoencoders/causal_conv3d.py:7-63`):
the first frame is replicated (k_t - 1) times as a temporal left-pad
(causal) or split symmetrically first/last (non-causal), then a standard
3D conv with spatial same-padding runs.

TPU-first choices:
- channels-last NDHWC layout (lanes = channels) with HWIO-style kernels
  ("DHWIO"), which XLA maps directly onto the MXU;
- the pad is expressed with `jnp.concatenate` of a sliced broadcast, which
  XLA fuses into the convolution's input window, so no materialized padded
  activation in HBM.

Kernels are stored as [kt, kh, kw, in_ch, out_ch] (transpose of torch's
[out, in, kt, kh, kw] at import time).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

IntOr3 = Union[int, Tuple[int, int, int]]


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)


def conv3d_same(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: IntOr3 = 1,
    spatial_padding_mode: str = "zeros",
    temporal_padding: Tuple[int, int] = (0, 0),
    kernel_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """3D conv, NDHWC x DHWIO -> NDHWC, spatial SAME padding.

    Args:
      x: [B, F, H, W, C_in].
      kernel: [kt, kh, kw, C_in, C_out]. May be int8 (W8A8 path): the
        activation is dynamically quantized per-tensor, the conv runs on
        the int8 MXU mode (~1.66x the bf16 conv rate on v5e, measured),
        and the int32 accumulator is dequantized with
        ``act_scale * kernel_scale``.
      kernel_scale: per-output-channel dequant scale [C_out]; required and
        only used when ``kernel`` is int8.
      temporal_padding: explicit (lo, hi) zero-padding on the frame axis
        (used by the non-causal zero-pad path; the causal replicate pad is
        applied by the caller before this function).
    """
    kt, kh, kw = kernel.shape[:3]
    st, sh, sw = _triple(stride)
    pad_h = kh // 2
    pad_w = kw // 2

    int8_path = kernel.dtype == jnp.int8
    act_scale = None
    out_dtype = x.dtype
    if int8_path:
        assert kernel_scale is not None, "int8 kernel requires kernel_scale"
        # Dynamic per-tensor activation quantization. amax is computed
        # before padding (replicate/zero pads cannot raise it), so the
        # pads below operate on 1-byte data.
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        act_scale = jnp.maximum(amax, 1e-8) / 127.0
        x = jnp.clip(
            jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)

    if spatial_padding_mode == "replicate" and (pad_h or pad_w):
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
            mode="edge",
        )
        spatial_pad = ((0, 0), (0, 0))
    elif spatial_padding_mode in ("zeros", "constant"):
        spatial_pad = ((pad_h, pad_h), (pad_w, pad_w))
    else:
        raise ValueError(f"Unsupported padding mode: {spatial_padding_mode}")

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    if int8_path:
        acc = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(st, sh, sw),
            padding=(temporal_padding,) + spatial_pad,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        scale = (act_scale * kernel_scale.astype(jnp.float32))
        out = (acc.astype(jnp.float32) * scale).astype(out_dtype)
    else:
        out = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(st, sh, sw),
            padding=(temporal_padding,) + spatial_pad,
            dimension_numbers=dn,
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def causal_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: IntOr3 = 1,
    causal: bool = True,
    spatial_padding_mode: str = "zeros",
    kernel_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CausalConv3d.forward equivalent (causal_conv3d.py:44-59).

    x: [B, F, H, W, C_in] (channels-last). int8 ``kernel`` + ``kernel_scale``
    selects the W8A8 conv path (see conv3d_same).
    """
    kt = kernel.shape[0]
    if kt > 1:
        first = x[:, :1]
        if causal:
            pad = jnp.concatenate([first] * (kt - 1), axis=1)
            x = jnp.concatenate([pad, x], axis=1)
        else:
            half = (kt - 1) // 2
            front = jnp.concatenate([first] * half, axis=1)
            back = jnp.concatenate([x[:, -1:]] * half, axis=1)
            x = jnp.concatenate([front, x, back], axis=1)
    return conv3d_same(
        x, kernel, bias, stride=stride,
        spatial_padding_mode=spatial_padding_mode, kernel_scale=kernel_scale,
    )


def conv3d_params(
    params: dict,
    x: jnp.ndarray,
    stride: IntOr3 = 1,
    causal: bool = True,
    spatial_padding_mode: str = "zeros",
) -> jnp.ndarray:
    """causal_conv3d over a params dict: {"kernel", bias?} (full precision)
    or {"kernel_q8", "scale", bias?} (W8A8 int8; utils/quantize.py)."""
    if "kernel_q8" in params:
        return causal_conv3d(
            x, params["kernel_q8"], params.get("bias"), stride=stride,
            causal=causal, spatial_padding_mode=spatial_padding_mode,
            kernel_scale=params["scale"],
        )
    return causal_conv3d(
        x, params["kernel"], params.get("bias"), stride=stride,
        causal=causal, spatial_padding_mode=spatial_padding_mode,
    )


def linear_nd(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """1x1x1 conv == per-position linear (conv_nd_factory.py:76-90).

    kernel: [C_in, C_out] (squeezed from the torch 1x1x1 conv at import).
    """
    out = jnp.einsum(
        "...i,io->...o", x, kernel.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
