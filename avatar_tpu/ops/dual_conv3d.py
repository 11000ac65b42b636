"""Factored (2+1)D convolution: spatial 2D conv then temporal 1D conv.

Re-design of ``DualConv3d``
(`/root/reference/ltx_video/models/autoencoders/dual_conv3d.py:10-187`),
used by the legacy ``dims=(2,1)`` VAE configs. One execution path only —
two grouped convs — which on TPU is always at least as good as the
reference's "materialize an equivalent separable conv3d" alternative path
(their consistency unit check proves the two are equal; here the factored
form IS the definition).

Channels-last x: [B, F, H, W, C]; kernels:
  spatial  [1, kh, kw, C_in, C_mid]
  temporal [kt, 1, 1, C_mid, C_out]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from avatar_tpu.ops.causal_conv3d import conv3d_same


def dual_conv3d(
    x: jnp.ndarray,
    spatial_kernel: jnp.ndarray,
    temporal_kernel: jnp.ndarray,
    spatial_bias: Optional[jnp.ndarray] = None,
    temporal_bias: Optional[jnp.ndarray] = None,
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    st, sh, sw = stride
    kt = temporal_kernel.shape[0]
    x = conv3d_same(
        x, spatial_kernel, spatial_bias, stride=(1, sh, sw),
        spatial_padding_mode=padding_mode,
    )
    pad_t = kt // 2
    return conv3d_same(
        x, temporal_kernel, temporal_bias, stride=(st, 1, 1),
        spatial_padding_mode=padding_mode,
        temporal_padding=(pad_t, pad_t),
    )
