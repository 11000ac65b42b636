"""Tiled VAE encode/decode (memory-bound strategy for large media).

Re-design of the reference's z-tiling and HW-tiling with overlap blending
(`/root/reference/ltx_video/models/autoencoders/vae.py:79-224,226-350`):
big inputs are split into temporal chunks and/or overlapping spatial tiles,
each tile runs through the (jitted) encoder/decoder, and overlaps are
linearly blended to hide seams.

On TPU the preferred strategy for big decodes is sharding the batch/spatial
axes over the mesh; tiling is kept for single-chip memory ceilings and
reference parity. Tiles have fixed shapes, so each distinct tile size
compiles once.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from avatar_tpu.models.vae import (
    VAEConfig,
    decoder_apply,
    encoder_apply,
)


def blend_t(a: jnp.ndarray, b: jnp.ndarray, extent: int, axis: int) -> jnp.ndarray:
    """Linear crossfade of b's leading `extent` slices with a's trailing ones
    (vae.py:154-182, one function for z/v/h)."""
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent == 0:
        return b
    ramp_shape = [1] * b.ndim
    ramp_shape[axis] = extent
    ramp = (jnp.arange(extent, dtype=b.dtype) / extent).reshape(ramp_shape)
    a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis], axis=axis)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
    blended = a_tail * (1 - ramp) + b_head * ramp
    b_rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    return jnp.concatenate([blended, b_rest], axis=axis)


def hw_tiled_encode(
    params: dict,
    cfg: VAEConfig,
    media: jnp.ndarray,  # [B, F, H, W, 3]
    tile_sample_size: int = 512,
    overlap_factor: float = 0.25,
) -> jnp.ndarray:
    """Overlapping spatial tiles -> encoder -> blend (vae.py:117-152).
    Returns moments [B, F', H', W', 2C]."""
    sf = cfg.spatial_downscale_factor
    tile_latent = tile_sample_size // sf
    overlap = int(tile_sample_size * (1 - overlap_factor))
    blend_extent = int(tile_latent * overlap_factor)
    row_limit = tile_latent - blend_extent

    enc = jax.jit(lambda p, x: encoder_apply(p, cfg, x))

    rows = []
    for i in range(0, media.shape[2], overlap):
        row = []
        for j in range(0, media.shape[3], overlap):
            tile = media[:, :, i : i + tile_sample_size, j : j + tile_sample_size]
            row.append(enc(params["encoder"], tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_t(rows[i - 1][j], tile, blend_extent, axis=2)
            if j > 0:
                tile = blend_t(row[j - 1], tile, blend_extent, axis=3)
            result_row.append(tile[:, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def hw_tiled_decode(
    params: dict,
    cfg: VAEConfig,
    latents: jnp.ndarray,  # [B, F', H', W', C]
    timestep: Optional[jnp.ndarray] = None,
    tile_sample_size: int = 512,
    overlap_factor: float = 0.25,
) -> jnp.ndarray:
    """Overlapping latent tiles -> decoder -> blend (vae.py:184-224)."""
    sf = cfg.spatial_downscale_factor
    tile_latent = tile_sample_size // sf
    overlap = int(tile_latent * (1 - overlap_factor))
    blend_extent = int(tile_sample_size * overlap_factor)
    row_limit = tile_sample_size - blend_extent

    dec = jax.jit(lambda p, z, t: decoder_apply(p, cfg, z, timestep=t))

    rows = []
    for i in range(0, latents.shape[2], overlap):
        row = []
        for j in range(0, latents.shape[3], overlap):
            tile = latents[:, :, i : i + tile_latent, j : j + tile_latent]
            row.append(dec(params["decoder"], tile, timestep))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_t(rows[i - 1][j], tile, blend_extent, axis=2)
            if j > 0:
                tile = blend_t(row[j - 1], tile, blend_extent, axis=3)
            result_row.append(tile[:, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def z_tiled_encode(
    params: dict,
    cfg: VAEConfig,
    media: jnp.ndarray,
    z_sample_size: int = 8,
    use_hw_tiling: bool = False,
    **hw_kwargs,
) -> jnp.ndarray:
    """Temporal chunking (vae.py:226-253): frame chunks of z_sample_size
    (multiple of 8) encoded independently and concatenated. Note: matches
    the reference's approximation — chunks do not see the causal context of
    earlier chunks."""
    assert z_sample_size % 8 == 0 or z_sample_size == 1
    f = media.shape[1]
    if f <= z_sample_size or z_sample_size <= 1:
        return (
            hw_tiled_encode(params, cfg, media, **hw_kwargs)
            if use_hw_tiling else encoder_apply(params["encoder"], cfg, media)
        )
    sizes = [z_sample_size] * (f // z_sample_size)
    if f - sum(sizes) > 0:
        sizes.append(f - sum(sizes))
    chunks, start = [], 0
    for size in sizes:
        chunk = media[:, start : start + size]
        chunks.append(
            hw_tiled_encode(params, cfg, chunk, **hw_kwargs)
            if use_hw_tiling else encoder_apply(params["encoder"], cfg, chunk)
        )
        start += size
    return jnp.concatenate(chunks, axis=1)


def z_tiled_decode(
    params: dict,
    cfg: VAEConfig,
    latents: jnp.ndarray,
    timestep: Optional[jnp.ndarray] = None,
    z_sample_size: int = 8,
    use_hw_tiling: bool = False,
    **hw_kwargs,
) -> jnp.ndarray:
    """Temporal latent chunking for decode (vae.py:306-345)."""
    f_l = latents.shape[1]
    split_size = max(1, z_sample_size // cfg.temporal_downscale_factor)
    if f_l <= split_size or z_sample_size <= 1:
        return (
            hw_tiled_decode(params, cfg, latents, timestep, **hw_kwargs)
            if use_hw_tiling
            else decoder_apply(params["decoder"], cfg, latents, timestep=timestep)
        )
    num_splits = math.ceil(f_l / split_size)
    outs = []
    for i in range(num_splits):
        chunk = latents[:, i * split_size : (i + 1) * split_size]
        outs.append(
            hw_tiled_decode(params, cfg, chunk, timestep, **hw_kwargs)
            if use_hw_tiling
            else decoder_apply(params["decoder"], cfg, chunk, timestep=timestep)
        )
    return jnp.concatenate(outs, axis=1)
