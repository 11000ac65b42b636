"""Causal video VAE (LTX "CausalVideoAutoencoder"), TPU-native.

Functional re-design of
`/root/reference/ltx_video/models/autoencoders/causal_video_autoencoder.py`
and `vae.py`: a config-driven block grammar
(res_x / res_x_y / attn_res_x / compress_{time,space,all}[_x_y] /
compress_{time,space,all}_res) builds an encoder (8x temporal, 32x spatial
incl. the 4x4 pixel patch) and a decoder with optional timestep-conditioned
output modulation.

TPU-first choices:
- channels-last [B, F, H, W, C] throughout (lanes = channels; convs map
  straight onto the MXU, no layout transposes between ops);
- pure `apply` functions over a params pytree; gradient checkpointing is a
  `jax.checkpoint` wrapper at the block level, not module state;
- the DiagonalGaussian posterior and per-channel latent statistics are
  explicit pure functions (vae.py:255, vae_encode.py:228-247).

Weight import from the reference safetensors checkpoints is in
``avatar_tpu.utils.weight_import`` (key remapping per
diffusers_config_mapping.py:148-174).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import (
    group_norm,
    init_conv3d,
    init_linear,
    init_timestep_embedder,
    linear,
    timestep_embedder,
)
from avatar_tpu.ops.attention import scaled_dot_product_attention
from avatar_tpu.ops.causal_conv3d import conv3d_params
from avatar_tpu.ops.normalization import layer_norm, pixel_norm, rms_norm
from avatar_tpu.ops.pixel_shuffle import (
    patchify_pixels,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    unpatchify_pixels,
)

BlockSpec = Tuple[str, Dict[str, Any]]

_COMPRESS_SPATIAL = ("compress_space", "compress_all", "compress_all_res",
                     "compress_space_res", "compress_all_x_y")
_COMPRESS_TEMPORAL = ("compress_time", "compress_all", "compress_all_res",
                      "compress_time_res", "compress_all_x_y")


def _normalize_blocks(blocks: Sequence) -> Tuple[BlockSpec, ...]:
    out = []
    for name, params in blocks:
        if isinstance(params, int):
            params = {"num_layers": params}
        out.append((name, dict(params)))
    return tuple(out)


@dataclass(frozen=True)
class VAEConfig:
    """Static VAE architecture config (causal_video_autoencoder.py:122-177)."""

    latent_channels: int
    encoder_blocks: Tuple[BlockSpec, ...]
    decoder_blocks: Tuple[BlockSpec, ...]
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 128
    decoder_base_channels: Optional[int] = None
    patch_size: int = 4
    norm_layer: str = "pixel_norm"  # pixel_norm | group_norm | layer_norm
    norm_num_groups: int = 32
    latent_log_var: str = "uniform"  # per_channel | uniform | constant | none
    use_quant_conv: bool = False
    causal_decoder: bool = False
    timestep_conditioning: bool = False
    spatial_padding_mode: str = "zeros"
    scaling_factor: float = 1.0
    normalize_latent_channels: bool = False

    @classmethod
    def from_dict(cls, config: dict) -> "VAEConfig":
        """Accepts the reference config schema (OURS_VAE_CONFIG and the demo
        config; causal_video_autoencoder.py:122-167)."""
        blocks = config.get("blocks")
        return cls(
            latent_channels=config["latent_channels"],
            encoder_blocks=_normalize_blocks(config.get("encoder_blocks", blocks)),
            decoder_blocks=_normalize_blocks(config.get("decoder_blocks", blocks)),
            in_channels=config.get("in_channels", 3),
            out_channels=config.get("out_channels", 3),
            base_channels=config.get("encoder_base_channels", 128),
            decoder_base_channels=config.get("decoder_base_channels"),
            patch_size=config.get("patch_size", 1),
            norm_layer=config.get("norm_layer", "group_norm"),
            latent_log_var=config.get(
                "latent_log_var",
                "per_channel" if config.get("double_z", True) else "none",
            ),
            use_quant_conv=config.get("use_quant_conv", True),
            causal_decoder=config.get("causal_decoder", False),
            timestep_conditioning=config.get("timestep_conditioning", False),
            spatial_padding_mode=config.get("spatial_padding_mode", "zeros"),
            scaling_factor=config.get("scaling_factor", 1.0),
            normalize_latent_channels=config.get(
                "normalize_latent_channels", False
            ),
        )

    def to_dict(self) -> dict:
        return {
            "_class_name": "CausalVideoAutoencoder",
            "dims": 3,
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "latent_channels": self.latent_channels,
            "encoder_blocks": [list(b) for b in self.encoder_blocks],
            "decoder_blocks": [list(b) for b in self.decoder_blocks],
            "scaling_factor": self.scaling_factor,
            "norm_layer": self.norm_layer,
            "patch_size": self.patch_size,
            "latent_log_var": self.latent_log_var,
            "use_quant_conv": self.use_quant_conv,
            "causal_decoder": self.causal_decoder,
            "timestep_conditioning": self.timestep_conditioning,
            "normalize_latent_channels": self.normalize_latent_channels,
        }

    # -- downscale factors (causal_video_autoencoder.py:207-241) --
    @property
    def spatial_downscale_factor(self) -> int:
        n = sum(1 for name, _ in self.encoder_blocks if name in _COMPRESS_SPATIAL)
        return 2**n * self.patch_size

    @property
    def temporal_downscale_factor(self) -> int:
        n = sum(1 for name, _ in self.encoder_blocks if name in _COMPRESS_TEMPORAL)
        return 2**n


# ---------------------------------------------------------------------------
# Channel bookkeeping
# ---------------------------------------------------------------------------


def _encoder_channel_walk(cfg: VAEConfig) -> List[Tuple[str, dict, int, int]]:
    """Yield (name, params, in_ch, out_ch) per encoder block."""
    out = []
    ch = cfg.base_channels
    for name, p in cfg.encoder_blocks:
        in_ch = ch
        if name in ("res_x_y", "compress_all_x_y", "compress_all_res",
                    "compress_space_res", "compress_time_res"):
            ch = p.get("multiplier", 2) * ch
        out.append((name, p, in_ch, ch))
    return out


def _decoder_initial_channels(cfg: VAEConfig) -> int:
    """Product of channel multipliers over reversed blocks
    (causal_video_autoencoder.py:605-612)."""
    ch = cfg.decoder_base_channels or cfg.base_channels
    for name, p in reversed(cfg.decoder_blocks):
        if name == "res_x_y":
            ch = ch * p.get("multiplier", 2)
        if name.startswith("compress"):
            ch = ch * p.get("multiplier", 1)
    return ch


def _decoder_channel_walk(cfg: VAEConfig) -> List[Tuple[str, dict, int, int]]:
    out = []
    ch = _decoder_initial_channels(cfg)
    for name, p in reversed(cfg.decoder_blocks):
        in_ch = ch
        if name == "res_x_y":
            ch = ch // p.get("multiplier", 2)
        elif name == "compress_all":
            ch = ch // p.get("multiplier", 1)
        out.append((name, p, in_ch, ch))
    return out


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_norm(key, ch: int, cfg: VAEConfig) -> dict:
    if cfg.norm_layer == "pixel_norm":
        return {}
    # group_norm / layer_norm with affine
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _init_resnet(
    key,
    in_ch: int,
    out_ch: int,
    cfg: VAEConfig,
    inject_noise: bool = False,
    timestep_conditioning: bool = False,
) -> dict:
    ks = jax.random.split(key, 6)
    p = {
        "norm1": _init_norm(ks[0], in_ch, cfg),
        "conv1": init_conv3d(ks[1], in_ch, out_ch),
        "norm2": _init_norm(ks[2], out_ch, cfg),
        "conv2": init_conv3d(ks[3], out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_linear(ks[4], in_ch, out_ch)
        p["norm3"] = {"scale": jnp.ones((in_ch,)), "bias": jnp.zeros((in_ch,))}
    if inject_noise:
        p["per_channel_scale1"] = jnp.zeros((out_ch, 1, 1))
        p["per_channel_scale2"] = jnp.zeros((out_ch, 1, 1))
    if timestep_conditioning:
        p["scale_shift_table"] = (
            jax.random.normal(ks[5], (4, in_ch)) / in_ch**0.5
        )
    return p


def _init_vae_attention(key, ch: int, head_dim: int) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "to_q": init_linear(ks[0], ch, ch),
        "to_k": init_linear(ks[1], ch, ch),
        "to_v": init_linear(ks[2], ch, ch),
        "to_out": init_linear(ks[3], ch, ch),
        "q_norm": {"scale": jnp.ones((ch,))},
        "k_norm": {"scale": jnp.ones((ch,))},
    }


def _init_mid_block(
    key,
    ch: int,
    num_layers: int,
    cfg: VAEConfig,
    inject_noise: bool = False,
    timestep_conditioning: bool = False,
    attention_head_dim: int = -1,
) -> dict:
    ks = jax.random.split(key, num_layers + 2)
    p = {
        "res_blocks": [
            _init_resnet(
                ks[i], ch, ch, cfg,
                inject_noise=inject_noise,
                timestep_conditioning=timestep_conditioning,
            )
            for i in range(num_layers)
        ]
    }
    if timestep_conditioning:
        p["time_embedder"] = init_timestep_embedder(ks[-1], ch * 4)
    if attention_head_dim > 0:
        ka = jax.random.split(ks[-2], num_layers)
        p["attention_blocks"] = [
            _init_vae_attention(ka[i], ch, attention_head_dim)
            for i in range(num_layers)
        ]
    return p


def init_encoder(key: jax.Array, cfg: VAEConfig) -> dict:
    walk = _encoder_channel_walk(cfg)
    ks = jax.random.split(key, len(walk) + 3)
    in_ch = cfg.in_channels * cfg.patch_size**2

    blocks = []
    for k, (name, p, bin_ch, bout_ch) in zip(ks[2:], walk):
        if name == "res_x":
            blocks.append(
                _init_mid_block(k, bin_ch, p["num_layers"], cfg)
            )
        elif name == "res_x_y":
            blocks.append(_init_resnet(k, bin_ch, bout_ch, cfg))
        elif name in ("compress_time", "compress_space", "compress_all",
                      "compress_all_x_y"):
            blocks.append(init_conv3d(k, bin_ch, bout_ch))
        elif name in ("compress_all_res", "compress_space_res",
                      "compress_time_res"):
            stride = _res_downsample_stride(name)
            blocks.append(
                {"conv": init_conv3d(k, bin_ch, bout_ch // int(np.prod(stride)))}
            )
        else:
            raise ValueError(f"unknown encoder block: {name}")

    out_ch_final = walk[-1][3] if walk else cfg.base_channels
    conv_out_ch = cfg.latent_channels
    if cfg.latent_log_var == "per_channel":
        conv_out_ch *= 2
    elif cfg.latent_log_var in ("uniform", "constant"):
        conv_out_ch += 1

    return {
        "conv_in": init_conv3d(ks[0], in_ch, cfg.base_channels),
        "blocks": blocks,
        "conv_norm_out": _init_norm(ks[1], out_ch_final, cfg),
        "conv_out": init_conv3d(ks[1], out_ch_final, conv_out_ch),
    }


def init_decoder(key: jax.Array, cfg: VAEConfig) -> dict:
    walk = _decoder_channel_walk(cfg)
    ks = jax.random.split(key, len(walk) + 4)
    init_ch = _decoder_initial_channels(cfg)

    blocks = []
    for k, (name, p, bin_ch, bout_ch) in zip(ks[3:], walk):
        if name in ("res_x", "attn_res_x"):
            blocks.append(
                _init_mid_block(
                    k, bin_ch, p["num_layers"], cfg,
                    inject_noise=p.get("inject_noise", False),
                    timestep_conditioning=cfg.timestep_conditioning,
                    attention_head_dim=p.get("attention_head_dim", -1),
                )
            )
        elif name == "res_x_y":
            blocks.append(
                _init_resnet(
                    k, bin_ch, bout_ch, cfg,
                    inject_noise=p.get("inject_noise", False),
                )
            )
        elif name in ("compress_time", "compress_space", "compress_all"):
            stride = _upsample_stride(name)
            out_ch = int(np.prod(stride)) * bin_ch // p.get("multiplier", 1)
            blocks.append({"conv": init_conv3d(k, bin_ch, out_ch)})
        else:
            raise ValueError(f"unknown decoder block: {name}")

    final_ch = walk[-1][3] if walk else init_ch
    out = {
        "conv_in": init_conv3d(ks[0], cfg.latent_channels, init_ch),
        "blocks": blocks,
        "conv_norm_out": _init_norm(ks[1], final_ch, cfg),
        "conv_out": init_conv3d(
            ks[1], final_ch, cfg.out_channels * cfg.patch_size**2
        ),
    }
    if cfg.timestep_conditioning:
        out["timestep_scale_multiplier"] = jnp.float32(1000.0)
        out["last_time_embedder"] = init_timestep_embedder(ks[2], final_ch * 2)
        out["last_scale_shift_table"] = (
            jax.random.normal(ks[2], (2, final_ch)) / final_ch**0.5
        )
    return out


def init_vae(key: jax.Array, cfg: VAEConfig) -> dict:
    ke, kd = jax.random.split(key)
    params = {
        "encoder": init_encoder(ke, cfg),
        "decoder": init_decoder(kd, cfg),
        "per_channel_statistics": {
            "std_of_means": jnp.ones((cfg.latent_channels,)),
            "mean_of_means": jnp.zeros((cfg.latent_channels,)),
        },
    }
    if cfg.normalize_latent_channels:
        # BatchNorm3d(affine=False) running stats (vae.py:62-68,261-284);
        # inference-time use only: normalize means at encode, invert at decode
        params["latent_norm"] = {
            "running_mean": jnp.zeros((cfg.latent_channels,)),
            "running_var": jnp.ones((cfg.latent_channels,)),
        }
    return params


def _res_downsample_stride(name: str) -> Tuple[int, int, int]:
    return {
        "compress_all_res": (2, 2, 2),
        "compress_space_res": (1, 2, 2),
        "compress_time_res": (2, 1, 1),
    }[name]


def _upsample_stride(name: str) -> Tuple[int, int, int]:
    return {
        "compress_all": (2, 2, 2),
        "compress_space": (1, 2, 2),
        "compress_time": (2, 1, 1),
    }[name]


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _apply_norm(params: dict, x: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    if cfg.norm_layer == "pixel_norm":
        return pixel_norm(x)
    if cfg.norm_layer == "group_norm":
        return group_norm(params, x, cfg.norm_num_groups)
    if cfg.norm_layer == "layer_norm":
        return layer_norm(
            x, params.get("scale"), params.get("bias"), eps=1e-6
        )
    raise ValueError(cfg.norm_layer)


def _apply_resnet(
    params: dict,
    x: jnp.ndarray,
    cfg: VAEConfig,
    causal: bool,
    timestep_embed: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """ResnetBlock3D.forward (causal_video_autoencoder.py:1195-1256)."""
    h = _apply_norm(params["norm1"], x, cfg)

    if "scale_shift_table" in params and timestep_embed is not None:
        b = x.shape[0]
        c = params["scale_shift_table"].shape[-1]
        # timestep_embed: [B, 4C] -> [B, 1, 1, 1, 4, C]
        ada = params["scale_shift_table"][None, None, None, None] + (
            timestep_embed.reshape(b, 1, 1, 1, 4, c)
        )
        shift1, scale1, shift2, scale2 = [
            ada[..., i, :] for i in range(4)
        ]
        h = h * (1 + scale1) + shift1

    h = jax.nn.silu(h)
    h = conv3d_params(
        params["conv1"], h,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )
    if "per_channel_scale1" in params and noise_key is not None:
        h = _feed_spatial_noise(h, params["per_channel_scale1"],
                                jax.random.fold_in(noise_key, 1))

    h = _apply_norm(params["norm2"], h, cfg)
    if "scale_shift_table" in params and timestep_embed is not None:
        h = h * (1 + scale2) + shift2
    h = jax.nn.silu(h)
    h = conv3d_params(
        params["conv2"], h,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )
    if "per_channel_scale2" in params and noise_key is not None:
        h = _feed_spatial_noise(h, params["per_channel_scale2"],
                                jax.random.fold_in(noise_key, 2))

    shortcut = x
    if "norm3" in params:
        shortcut = layer_norm(
            shortcut, params["norm3"]["scale"], params["norm3"]["bias"], eps=1e-6
        )
    if "conv_shortcut" in params:
        shortcut = linear(params["conv_shortcut"], shortcut)
    return shortcut + h


def _feed_spatial_noise(
    h: jnp.ndarray, per_channel_scale: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """StyleGAN-style spatial noise (causal_video_autoencoder.py:1181-1193).
    per_channel_scale: [C, 1, 1] (torch layout kept for import parity)."""
    spatial = h.shape[2:4]  # (H, W) in NDHWC
    noise = jax.random.normal(key, spatial, dtype=h.dtype)  # [H, W]
    scaled = noise[None, None, :, :, None] * per_channel_scale.reshape(
        1, 1, 1, 1, -1
    ).astype(h.dtype)
    return h + scaled


def _apply_vae_attention(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head-group self-attention over flattened video tokens with
    qk rms-norm and residual connection (UNetMidBlock3D attention,
    causal_video_autoencoder.py:918-963). x: [B, F, H, W, C]."""
    b, f, h, w, c = x.shape
    tokens = x.reshape(b, f * h * w, c)
    q = rms_norm(linear(params["to_q"], tokens),
                 params["q_norm"]["scale"], eps=1e-5)
    k = rms_norm(linear(params["to_k"], tokens),
                 params["k_norm"]["scale"], eps=1e-5)
    v = linear(params["to_v"], tokens)
    heads = c // 64 if c % 64 == 0 and c >= 64 else 1
    head_dim = c // heads

    def split(t):
        return t.reshape(b, -1, heads, head_dim).transpose(0, 2, 1, 3)

    out = scaled_dot_product_attention(split(q), split(k), split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, c)
    out = linear(params["to_out"], out)
    return (out + tokens).reshape(b, f, h, w, c)


def _apply_mid_block(
    params: dict,
    x: jnp.ndarray,
    cfg: VAEConfig,
    causal: bool,
    timestep: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """UNetMidBlock3D.forward (causal_video_autoencoder.py:895-971)."""
    timestep_embed = None
    if "time_embedder" in params and timestep is not None:
        timestep_embed = timestep_embedder(
            params["time_embedder"], timestep.flatten(), dtype=x.dtype
        )  # [B, 4C]

    attn_blocks = params.get("attention_blocks")
    for i, res in enumerate(params["res_blocks"]):
        nk = None if noise_key is None else jax.random.fold_in(noise_key, i)
        x = _apply_resnet(
            res, x, cfg, causal, timestep_embed=timestep_embed, noise_key=nk
        )
        if attn_blocks is not None:
            x = _apply_vae_attention(attn_blocks[i], x)
    return x


def _apply_space_to_depth_down(
    params: dict, x: jnp.ndarray, stride: Tuple[int, int, int],
    cfg: VAEConfig, causal: bool,
) -> jnp.ndarray:
    """SpaceToDepthDownsample.forward (causal_video_autoencoder.py:989-1018)."""
    if stride[0] == 2:
        x = jnp.concatenate([x[:, :1], x], axis=1)  # duplicate first frame

    conv_kernel = params["conv"].get("kernel", params["conv"].get("kernel_q8"))
    out_ch_conv = conv_kernel.shape[-1]  # also valid for int8 (w8a8) convs
    in_ch = x.shape[-1]
    group_size = in_ch * int(np.prod(stride)) // (out_ch_conv * int(np.prod(stride)))

    # skip connection: unshuffle then mean over channel groups
    x_in = pixel_unshuffle_3d(x, stride)  # [B, F/s, H/s, W/s, C*prod(s)]
    # reference groups as (c g) with g = group_size over torch channel-major
    bb, ff, hh, ww, cc = x_in.shape
    x_in = x_in.reshape(bb, ff, hh, ww, cc // group_size, group_size).mean(-1)

    h = conv3d_params(
        params["conv"], x,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )
    h = pixel_unshuffle_3d(h, stride)
    return h + x_in


def _apply_depth_to_space_up(
    params: dict,
    x: jnp.ndarray,
    stride: Tuple[int, int, int],
    cfg: VAEConfig,
    causal: bool,
    residual: bool = False,
    out_channels_reduction_factor: int = 1,
) -> jnp.ndarray:
    """DepthToSpaceUpsample.forward (causal_video_autoencoder.py:1049-1063)."""
    if residual:
        x_in = pixel_shuffle_3d(x, stride)
        num_repeat = int(np.prod(stride)) // out_channels_reduction_factor
        x_in = jnp.tile(x_in, (1, 1, 1, 1, num_repeat))
        if stride[0] == 2:
            x_in = x_in[:, 1:]
    h = conv3d_params(
        params["conv"], x,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )
    h = pixel_shuffle_3d(h, stride)
    if stride[0] == 2:
        h = h[:, 1:]
    if residual:
        h = h + x_in
    return h


def encoder_apply(
    params: dict,
    cfg: VAEConfig,
    sample: jnp.ndarray,
    remat: bool = False,
) -> jnp.ndarray:
    """Encoder.forward (causal_video_autoencoder.py:508-555).

    sample: [B, F, H, W, 3] -> moments [B, F', H', W', 2*latent_channels].
    """
    x = patchify_pixels(sample, patch_size_hw=cfg.patch_size, patch_size_t=1)
    x = conv3d_params(
        params["conv_in"], x,
        causal=True, spatial_padding_mode=cfg.spatial_padding_mode,
    )

    def run_block(block_params, x, name, bparams):
        if name == "res_x":
            return _apply_mid_block(block_params, x, cfg, causal=True)
        if name == "res_x_y":
            return _apply_resnet(block_params, x, cfg, causal=True)
        if name in ("compress_time", "compress_space", "compress_all",
                    "compress_all_x_y"):
            stride = {
                "compress_time": (2, 1, 1),
                "compress_space": (1, 2, 2),
                "compress_all": (2, 2, 2),
                "compress_all_x_y": (2, 2, 2),
            }[name]
            return conv3d_params(
                block_params, x, stride=stride, causal=True,
                spatial_padding_mode=cfg.spatial_padding_mode,
            )
        if name in ("compress_all_res", "compress_space_res",
                    "compress_time_res"):
            return _apply_space_to_depth_down(
                block_params, x, _res_downsample_stride(name), cfg, causal=True
            )
        raise ValueError(name)

    for block_params, (name, bparams) in zip(params["blocks"], cfg.encoder_blocks):
        fn = lambda bp, xx: run_block(bp, xx, name, bparams)  # noqa: E731
        if remat:
            fn = jax.checkpoint(fn)
        x = fn(block_params, x)

    x = _apply_norm(params["conv_norm_out"], x, cfg)
    x = jax.nn.silu(x)
    x = conv3d_params(
        params["conv_out"], x,
        causal=True, spatial_padding_mode=cfg.spatial_padding_mode,
    )

    if cfg.latent_log_var == "uniform":
        last_channel = x[..., -1:]
        repeated = jnp.repeat(last_channel, x.shape[-1] - 2, axis=-1)
        x = jnp.concatenate([x, repeated], axis=-1)
    elif cfg.latent_log_var == "constant":
        x = x[..., :-1]
        x = jnp.concatenate([x, jnp.full_like(x, -30.0)], axis=-1)
    return x


def decoder_apply(
    params: dict,
    cfg: VAEConfig,
    sample: jnp.ndarray,
    timestep: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Decoder.forward (causal_video_autoencoder.py:733-800).

    sample: [B, F', H', W', latent_channels] -> [B, F, H, W, 3].
    """
    causal = cfg.causal_decoder
    batch = sample.shape[0]
    x = conv3d_params(
        params["conv_in"], sample,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )

    scaled_timestep = None
    if cfg.timestep_conditioning:
        assert timestep is not None, "timestep required (timestep_conditioning)"
        scaled_timestep = timestep * params["timestep_scale_multiplier"]

    walk = _decoder_channel_walk(cfg)
    for i, (block_params, (name, bparams, _, _)) in enumerate(
        zip(params["blocks"], walk)
    ):
        nk = None if noise_key is None else jax.random.fold_in(noise_key, i)

        def run(bp, xx):
            if name in ("res_x", "attn_res_x"):
                return _apply_mid_block(
                    bp, xx, cfg, causal=causal,
                    timestep=scaled_timestep, noise_key=nk,
                )
            if name == "res_x_y":
                return _apply_resnet(bp, xx, cfg, causal=causal, noise_key=nk)
            if name in ("compress_time", "compress_space", "compress_all"):
                return _apply_depth_to_space_up(
                    bp, xx, _upsample_stride(name), cfg, causal=causal,
                    residual=bparams.get("residual", False),
                    out_channels_reduction_factor=bparams.get("multiplier", 1),
                )
            raise ValueError(name)

        fn = jax.checkpoint(run) if remat else run
        x = fn(block_params, x)

    x = _apply_norm(params["conv_norm_out"], x, cfg)

    if cfg.timestep_conditioning:
        embedded = timestep_embedder(
            params["last_time_embedder"], scaled_timestep.flatten(), dtype=x.dtype
        )  # [B, 2C]
        c = params["last_scale_shift_table"].shape[-1]
        ada = params["last_scale_shift_table"][None, None, None, None] + (
            embedded.reshape(batch, 1, 1, 1, 2, c)
        )
        shift, scale = ada[..., 0, :], ada[..., 1, :]
        x = x * (1 + scale) + shift

    x = jax.nn.silu(x)
    x = conv3d_params(
        params["conv_out"], x,
        causal=causal, spatial_padding_mode=cfg.spatial_padding_mode,
    )
    return unpatchify_pixels(x, patch_size_hw=cfg.patch_size, patch_size_t=1)


# ---------------------------------------------------------------------------
# Posterior + latent statistics (vae.py:255, vae_encode.py:228-247)
# ---------------------------------------------------------------------------


def posterior_mode(moments: jnp.ndarray) -> jnp.ndarray:
    c = moments.shape[-1] // 2
    return moments[..., :c]


def posterior_sample(moments: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    c = moments.shape[-1] // 2
    mean = moments[..., :c]
    logvar = jnp.clip(moments[..., c:], -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def normalize_latents(
    latents: jnp.ndarray,
    params: dict,
    cfg: VAEConfig,
    per_channel: bool = True,
) -> jnp.ndarray:
    """vae_encode.py:228-236 (channels-last)."""
    stats = params["per_channel_statistics"]
    if per_channel:
        return (
            latents - stats["mean_of_means"].astype(latents.dtype)
        ) / stats["std_of_means"].astype(latents.dtype)
    return latents * cfg.scaling_factor


def un_normalize_latents(
    latents: jnp.ndarray,
    params: dict,
    cfg: VAEConfig,
    per_channel: bool = True,
) -> jnp.ndarray:
    """vae_encode.py:239-247 (channels-last)."""
    stats = params["per_channel_statistics"]
    if per_channel:
        return latents * stats["std_of_means"].astype(
            latents.dtype
        ) + stats["mean_of_means"].astype(latents.dtype)
    return latents / cfg.scaling_factor


def vae_encode(
    params: dict,
    cfg: VAEConfig,
    media: jnp.ndarray,
    key: Optional[jax.Array] = None,
    sample_posterior: bool = True,
    per_channel_normalize: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """media [B, F, H, W, 3] -> normalized latents [B, F', H', W', C]
    (vae_encode.py:22-91; the torch version's split/mark_step batching
    disappears under jit)."""
    moments = encoder_apply(params["encoder"], cfg, media, remat=remat)
    if cfg.normalize_latent_channels and "latent_norm" in params:
        # vae.py:261-273: BatchNorm (running stats) on the mean half only
        c = moments.shape[-1] // 2
        ln = params["latent_norm"]
        mean_half = (moments[..., :c] - ln["running_mean"]) * (
            ln["running_var"] + 1e-5
        ) ** -0.5
        moments = jnp.concatenate([mean_half, moments[..., c:]], axis=-1)
    if sample_posterior:
        assert key is not None
        latents = posterior_sample(moments, key)
    else:
        latents = posterior_mode(moments)
    return normalize_latents(latents, params, cfg, per_channel_normalize)


def vae_decode(
    params: dict,
    cfg: VAEConfig,
    latents: jnp.ndarray,
    timestep: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
    per_channel_normalize: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """normalized latents -> pixels [B, F, H, W, 3] (vae_encode.py:94-165)."""
    z = un_normalize_latents(latents, params, cfg, per_channel_normalize)
    if cfg.normalize_latent_channels and "latent_norm" in params:
        # vae.py:275-284: invert the BatchNorm with running stats
        ln = params["latent_norm"]
        z = z * jnp.sqrt(ln["running_var"] + 1e-5) + ln["running_mean"]
    return decoder_apply(
        params["decoder"], cfg, z,
        timestep=timestep, noise_key=noise_key, remat=remat,
    )


def demo_config(latent_channels: int = 64) -> VAEConfig:
    """Tiny random-init config mirroring the reference demo/test fixture
    (causal_video_autoencoder.py:1300-1331)."""
    return VAEConfig.from_dict(
        {
            "_class_name": "CausalVideoAutoencoder",
            "dims": 3,
            "encoder_blocks": [
                ("res_x", {"num_layers": 2}),
                ("compress_space_res", {"multiplier": 2}),
                ("compress_time_res", {"multiplier": 2}),
                ("compress_all_res", {"multiplier": 2}),
                ("compress_all_res", {"multiplier": 2}),
                ("res_x", {"num_layers": 1}),
            ],
            "decoder_blocks": [
                ("res_x", {"num_layers": 2, "inject_noise": False}),
                ("compress_all", {"residual": True, "multiplier": 2}),
                ("compress_all", {"residual": True, "multiplier": 2}),
                ("compress_all", {"residual": True, "multiplier": 2}),
                ("res_x", {"num_layers": 2, "inject_noise": False}),
            ],
            "latent_channels": latent_channels,
            "norm_layer": "pixel_norm",
            "patch_size": 4,
            "latent_log_var": "uniform",
            "use_quant_conv": False,
            "causal_decoder": False,
            "timestep_conditioning": True,
            "spatial_padding_mode": "replicate",
        }
    )


LTX_VAE_CONFIG = {
    # The shipped 2B LTX-Video VAE (diffusers_config_mapping.py:106-130).
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3,
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 128,
    "blocks": [
        ["res_x", 4],
        ["compress_all", 1],
        ["res_x_y", 1],
        ["res_x", 3],
        ["compress_all", 1],
        ["res_x_y", 1],
        ["res_x", 3],
        ["compress_all", 1],
        ["res_x", 3],
        ["res_x", 4],
    ],
    "scaling_factor": 1.0,
    "norm_layer": "pixel_norm",
    "patch_size": 4,
    "latent_log_var": "uniform",
    "use_quant_conv": False,
    "causal_decoder": False,
}
