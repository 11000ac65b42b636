"""Latent upsampler for the multi-scale pipeline, TPU-native.

Re-design of ``LatentUpsampler``
(`/root/reference/ltx_video/models/autoencoders/latent_upsampler.py:42-193`):
conv -> GroupNorm -> SiLU -> N ResBlocks -> pixel-shuffle 2x upsample
(spatial and/or temporal) -> N ResBlocks -> conv. Channels-last
[B, F, H, W, C]; 2D convs are expressed as 3D convs with a 1-frame kernel
so one code path serves dims 2 and 3.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import group_norm
from avatar_tpu.ops.causal_conv3d import conv3d_same
from avatar_tpu.ops.pixel_shuffle import pixel_shuffle_3d


@dataclass(frozen=True)
class LatentUpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    dims: int = 3
    spatial_upsample: bool = True
    temporal_upsample: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "LatentUpsamplerConfig":
        return cls(
            in_channels=d.get("in_channels", 4),
            mid_channels=d.get("mid_channels", 128),
            num_blocks_per_stage=d.get("num_blocks_per_stage", 4),
            dims=d.get("dims", 2),
            spatial_upsample=d.get("spatial_upsample", True),
            temporal_upsample=d.get("temporal_upsample", False),
        )

    def to_dict(self) -> dict:
        return {
            "_class_name": "LatentUpsampler",
            "in_channels": self.in_channels,
            "mid_channels": self.mid_channels,
            "num_blocks_per_stage": self.num_blocks_per_stage,
            "dims": self.dims,
            "spatial_upsample": self.spatial_upsample,
            "temporal_upsample": self.temporal_upsample,
        }


def _kernel_size(cfg: LatentUpsamplerConfig) -> tuple:
    # dims==2 -> per-frame conv == 3D conv with temporal kernel 1
    return (1, 3, 3) if cfg.dims == 2 else (3, 3, 3)


def _init_conv(key, in_ch, out_ch, cfg) -> dict:
    import math

    kt, kh, kw = _kernel_size(cfg)
    kw_key, kb_key = jax.random.split(key)
    fan_in = in_ch * kt * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(
            kw_key, (kt, kh, kw, in_ch, out_ch), jnp.float32,
            -math.sqrt(3) * bound, math.sqrt(3) * bound,
        ),
        "bias": jax.random.uniform(kb_key, (out_ch,), jnp.float32, -bound, bound),
    }


def _conv(p, x, cfg):
    kt = p["kernel"].shape[0]
    pad = (kt // 2, kt // 2)
    return conv3d_same(x, p["kernel"], p.get("bias"), temporal_padding=pad)


def _init_resblock(key, ch, cfg) -> dict:
    ks = jax.random.split(key, 2)
    return {
        "conv1": _init_conv(ks[0], ch, ch, cfg),
        "norm1": {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))},
        "conv2": _init_conv(ks[1], ch, ch, cfg),
        "norm2": {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))},
    }


def _resblock(p, x, cfg):
    residual = x
    x = _conv(p["conv1"], x, cfg)
    x = group_norm(p["norm1"], x, 32)
    x = jax.nn.silu(x)
    x = _conv(p["conv2"], x, cfg)
    x = group_norm(p["norm2"], x, 32)
    return jax.nn.silu(x + residual)


def init_latent_upsampler(key: jax.Array, cfg: LatentUpsamplerConfig) -> dict:
    ks = jax.random.split(key, 2 * cfg.num_blocks_per_stage + 3)
    mid = cfg.mid_channels
    if cfg.spatial_upsample and cfg.temporal_upsample:
        up_out = 8 * mid
    elif cfg.spatial_upsample:
        up_out = 4 * mid
    else:
        up_out = 2 * mid
    # The reference's upsampler conv is 2D (applied per frame) unless
    # temporal upsampling is on (latent_upsampler.py:84-101,137-143).
    import dataclasses as _dc

    up_cfg = cfg if cfg.temporal_upsample else _dc.replace(cfg, dims=2)
    return {
        "initial_conv": _init_conv(ks[0], cfg.in_channels, mid, cfg),
        "initial_norm": {"scale": jnp.ones((mid,)), "bias": jnp.zeros((mid,))},
        "res_blocks": [
            _init_resblock(ks[1 + i], mid, cfg)
            for i in range(cfg.num_blocks_per_stage)
        ],
        "upsampler_conv": _init_conv(ks[-2], mid, up_out, up_cfg),
        "post_res_blocks": [
            _init_resblock(ks[1 + cfg.num_blocks_per_stage + i], mid, cfg)
            for i in range(cfg.num_blocks_per_stage)
        ],
        "final_conv": _init_conv(ks[-1], mid, cfg.in_channels, cfg),
    }


def latent_upsampler_apply(
    params: dict, cfg: LatentUpsamplerConfig, latent: jnp.ndarray
) -> jnp.ndarray:
    """latent [B, F, H, W, C] -> upsampled latent."""
    x = _conv(params["initial_conv"], latent, cfg)
    x = group_norm(params["initial_norm"], x, 32)
    x = jax.nn.silu(x)
    for block in params["res_blocks"]:
        x = _resblock(block, x, cfg)

    x = _conv(params["upsampler_conv"], x, cfg)
    if cfg.spatial_upsample and cfg.temporal_upsample:
        x = pixel_shuffle_3d(x, (2, 2, 2))
        x = x[:, 1:]
    elif cfg.spatial_upsample:
        x = pixel_shuffle_3d(x, (1, 2, 2))
    else:
        x = pixel_shuffle_3d(x, (2, 1, 1))
        x = x[:, 1:]

    for block in params["post_res_blocks"]:
        x = _resblock(block, x, cfg)
    return _conv(params["final_conv"], x, cfg)


def import_latent_upsampler_state(
    state: Dict[str, np.ndarray], cfg: LatentUpsamplerConfig
) -> dict:
    """torch state dict -> pytree. torch convs are [out,in,(kt),kh,kw]."""

    def conv(key):
        w = np.asarray(state[f"{key}.weight"])
        if w.ndim == 4:  # 2D conv -> [1, kh, kw, in, out]
            w = w.transpose(2, 3, 1, 0)[None]
        else:
            w = w.transpose(2, 3, 4, 1, 0)
        return {
            "kernel": jnp.asarray(w),
            "bias": jnp.asarray(state[f"{key}.bias"]),
        }

    def norm(key):
        return {
            "scale": jnp.asarray(state[f"{key}.weight"]),
            "bias": jnp.asarray(state[f"{key}.bias"]),
        }

    def res(prefix):
        return {
            "conv1": conv(f"{prefix}.conv1"),
            "norm1": norm(f"{prefix}.norm1"),
            "conv2": conv(f"{prefix}.conv2"),
            "norm2": norm(f"{prefix}.norm2"),
        }

    return {
        "initial_conv": conv("initial_conv"),
        "initial_norm": norm("initial_norm"),
        "res_blocks": [
            res(f"res_blocks.{i}") for i in range(cfg.num_blocks_per_stage)
        ],
        "upsampler_conv": conv("upsampler.0"),
        "post_res_blocks": [
            res(f"post_upsample_res_blocks.{i}")
            for i in range(cfg.num_blocks_per_stage)
        ],
        "final_conv": conv("final_conv"),
    }


def load_latent_upsampler(path: str):
    """Single-file safetensors with embedded config (latent_upsampler.py:173-193)."""
    import json

    from avatar_tpu.utils.safetensors_io import load_safetensors

    tensors, metadata = load_safetensors(path)
    cfg = LatentUpsamplerConfig.from_dict(json.loads(metadata["config"]))
    return cfg, import_latent_upsampler_state(tensors, cfg)
