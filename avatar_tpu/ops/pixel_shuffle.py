"""Pixel (un)shuffle and pixel-space patchify for channels-last video tensors.

Covers ``PixelShuffleND`` (pixel_shuffle.py:5-33) and the VAE's pixel-space
``patchify``/``unpatchify`` (causal_video_autoencoder.py:1259-1297), in
NDHWC layout: x is [B, F, H, W, C].

Channel-order note: the reference shuffles torch NCFHW channel blocks of
shape (c, p1, p2, p3); in channels-last we keep the same (c-major) order so
imported torch weights stay bit-compatible after layout transposition.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from einops import rearrange


def pixel_shuffle_3d(x: jnp.ndarray, factors: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, F, H, W, C*p1*p2*p3] -> [B, F*p1, H*p2, W*p3, C]."""
    p1, p2, p3 = factors
    return rearrange(
        x,
        "b f h w (c p1 p2 p3) -> b (f p1) (h p2) (w p3) c",
        p1=p1, p2=p2, p3=p3,
    )


def pixel_unshuffle_3d(x: jnp.ndarray, factors: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, F*p1, H*p2, W*p3, C] -> [B, F, H, W, C*p1*p2*p3]."""
    p1, p2, p3 = factors
    return rearrange(
        x,
        "b (f p1) (h p2) (w p3) c -> b f h w (c p1 p2 p3)",
        p1=p1, p2=p2, p3=p3,
    )


def patchify_pixels(
    x: jnp.ndarray, patch_size_hw: int, patch_size_t: int = 1
) -> jnp.ndarray:
    """VAE input patchify (causal_video_autoencoder.py:1259-1277).

    Matches the reference channel order "b c (f p) (h q) (w r) -> b (c p r q) f h w"
    — note the swapped (r q)! — transposed to channels-last.
    """
    if patch_size_hw == 1 and patch_size_t == 1:
        return x
    return rearrange(
        x,
        "b (f p) (h q) (w r) c -> b f h w (c p r q)",
        p=patch_size_t, q=patch_size_hw, r=patch_size_hw,
    )


def unpatchify_pixels(
    x: jnp.ndarray, patch_size_hw: int, patch_size_t: int = 1
) -> jnp.ndarray:
    """Inverse of :func:`patchify_pixels` (causal_video_autoencoder.py:1280-1297)."""
    if patch_size_hw == 1 and patch_size_t == 1:
        return x
    return rearrange(
        x,
        "b f h w (c p r q) -> b (f p) (h q) (w r) c",
        p=patch_size_t, q=patch_size_hw, r=patch_size_hw,
    )
