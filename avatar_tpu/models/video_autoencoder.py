"""Legacy (non-causal) VideoAutoencoder for old checkpoint compatibility.

Re-design of `/root/reference/ltx_video/models/autoencoders/video_autoencoder.py`
(the pre-causal LTX VAE family: ``block_out_channels`` encoder/decoder with
strided-conv downsampling and nearest-interpolation upsampling). The avatar
flow never uses it (SURVEY §2.2: "kept for checkpoint compat"), but loading
old ``VideoAutoencoder`` checkpoints keeps working here.

Channels-last [B, F, H, W, C]; plain (non-causal) zero-padded convs. The
``dims=(2,1)`` variant factors every conv into DualConv3d (spatial 2D then
temporal 1D, ops/dual_conv3d.py) with the reference's skip-time-conv
behavior for image (single-frame) down/upsampling, and
``add_channel_padding`` replicates the reference's front-zero channel pad /
front-truncation around pixel patchification (video_autoencoder.py:870-931).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import group_norm, init_conv3d
from avatar_tpu.ops.causal_conv3d import conv3d_same, linear_nd
from avatar_tpu.ops.dual_conv3d import dual_conv3d
from avatar_tpu.ops.normalization import pixel_norm
from avatar_tpu.ops.pixel_shuffle import patchify_pixels, unpatchify_pixels


@dataclass(frozen=True)
class VideoAutoencoderConfig:
    latent_channels: int
    block_out_channels: Tuple[int, ...]
    in_channels: int = 3
    out_channels: int = 3
    layers_per_block: int = 2
    norm_num_groups: int = 32
    patch_size: int = 1
    patch_size_t: Optional[int] = None
    norm_layer: str = "group_norm"
    latent_log_var: str = "per_channel"
    use_quant_conv: bool = True
    dims: object = 3  # 3 or (2, 1)
    add_channel_padding: bool = False

    @classmethod
    def from_dict(cls, config: dict) -> "VideoAutoencoderConfig":
        assert config["_class_name"] == "VideoAutoencoder"
        dims = config.get("dims", 3)
        if isinstance(dims, list):
            dims = tuple(dims)
        assert dims in (3, (2, 1)), f"dims must be 3 or (2, 1), got {dims}"
        double_z = config.get("double_z", True)
        return cls(
            dims=dims,
            add_channel_padding=config.get("add_channel_padding", False),
            latent_channels=config["latent_channels"],
            block_out_channels=tuple(config["block_out_channels"]),
            in_channels=config.get("in_channels", 3),
            out_channels=config.get("out_channels", 3),
            patch_size=config.get("patch_size", 1),
            patch_size_t=config.get("patch_size_t", config.get("patch_size", 1)),
            norm_layer=config.get("norm_layer", "group_norm"),
            latent_log_var=config.get(
                "latent_log_var", "per_channel" if double_z else "none"
            ),
            use_quant_conv=config.get("use_quant_conv", True),
        )

    @property
    def _pst(self) -> int:
        return self.patch_size_t if self.patch_size_t is not None else self.patch_size

    @property
    def spatial_downscale_factor(self) -> int:
        n = sum(
            1 for i in range(len(self.block_out_channels))
            if i < len(self.block_out_channels) - 1 and 2**i >= self.patch_size
        )
        return 2**n * self.patch_size


def _norm(params, x, cfg: VideoAutoencoderConfig):
    if cfg.norm_layer == "pixel_norm":
        return pixel_norm(x)
    return group_norm(params, x, cfg.norm_num_groups)


def _conv(p, x, stride=(1, 1, 1), skip_time_conv=False):
    """Plain conv3d or DualConv3d params ({"spatial", "temporal"}).

    skip_time_conv: the reference's DualConv3d image path — apply only the
    spatial conv (dual_conv3d.py:116-131,157-168)."""
    if "spatial" in p:
        sp, tp = p["spatial"], p["temporal"]
        st, sh, sw = stride
        if skip_time_conv:
            return conv3d_same(
                x, sp["kernel"], sp.get("bias"), stride=(1, sh, sw)
            )
        return dual_conv3d(
            x, sp["kernel"], tp["kernel"], sp.get("bias"), tp.get("bias"),
            stride=stride,
        )
    kt = p["kernel"].shape[0]
    return conv3d_same(
        x, p["kernel"], p.get("bias"), stride=stride,
        temporal_padding=(kt // 2, kt // 2),
    )


def _init_norm(ch, cfg):
    if cfg.norm_layer == "pixel_norm":
        return {}
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _init_conv(key, cin, cout, cfg, kernel_size=3):
    """dims-aware conv init: plain conv3d or DualConv3d pair (intermediate
    channels = max(cin, cout), reference dual_conv3d.py:47-49)."""
    if cfg.dims == 3:
        return init_conv3d(key, cin, cout, kernel_size)
    mid = cout if cin < cout else cin
    k1, k2 = jax.random.split(key)
    sp = init_conv3d(k1, cin, mid, kernel_size)
    tp = init_conv3d(k2, mid, cout, kernel_size)
    return {
        "spatial": {"kernel": sp["kernel"][:1], "bias": sp["bias"]},
        "temporal": {"kernel": tp["kernel"][:, :1, :1], "bias": tp["bias"]},
    }


def _init_resnet(key, cin, cout, cfg):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin, cfg),
        "conv1": _init_conv(ks[0], cin, cout, cfg),
        "norm2": _init_norm(cout, cfg),
        "conv2": _init_conv(ks[1], cout, cout, cfg),
    }
    if cin != cout:
        from avatar_tpu.models.layers import init_linear

        p["conv_shortcut"] = init_linear(ks[2], cin, cout)
    return p


def _apply_resnet(p, x, cfg):
    h = _norm(p["norm1"], x, cfg)
    h = jax.nn.silu(h)
    h = _conv(p["conv1"], h)
    h = _norm(p["norm2"], h, cfg)
    h = jax.nn.silu(h)
    h = _conv(p["conv2"], h)
    shortcut = linear_nd(
        x, p["conv_shortcut"]["kernel"], p["conv_shortcut"].get("bias")
    ) if "conv_shortcut" in p else x
    return shortcut + h


def _valid_conv(x, kernel, bias, stride):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), stride, [(0, 0), (0, 0), (0, 0)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
        ),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _downsample(p, x, in_time: bool):
    """Downsample3D with asymmetric (0,1) zero pad and stride-2 VALID conv
    (video_autoencoder.py:773-810; the encoder uses downsample_padding=0).
    dims=(2,1): spatial conv strides (2,2); the temporal conv is skipped
    entirely when not downsampling in time (skip_time_conv)."""
    pad_t = (0, 1) if in_time else (0, 0)
    x = jnp.pad(x, ((0, 0), pad_t, (0, 1), (0, 1), (0, 0)))
    if "spatial" in p:
        sp, tp = p["spatial"], p["temporal"]
        x = _valid_conv(x, sp["kernel"], sp.get("bias"), (1, 2, 2))
        if not in_time:
            return x
        return _valid_conv(x, tp["kernel"], tp.get("bias"), (2, 1, 1))
    stride = (2 if in_time else 1, 2, 2)
    return _valid_conv(x, p["kernel"], p.get("bias"), stride)


def _upsample(p, x, in_time: bool):
    """Upsample3D: nearest 2x spatial (+ temporal) then conv
    (video_autoencoder.py:812-860).  dims=(2,1) without temporal upsampling
    applies only the spatial conv (skip_time_conv)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if "spatial" in p and not in_time:
        return _conv(p, x, skip_time_conv=True)
    if in_time:
        x = jnp.repeat(x, 2, axis=1)
    return _conv(p, x)


def init_video_autoencoder(key: jax.Array, cfg: VideoAutoencoderConfig) -> dict:
    ks = iter(jax.random.split(key, 1024))
    boc = cfg.block_out_channels
    lpb = cfg.layers_per_block

    # encoder (add_channel_padding: conv_in/out consume patch_size**3
    # channels regardless of patch_size_t — video_autoencoder.py:230-234)
    if cfg.add_channel_padding:
        enc_in_ch = cfg.in_channels * cfg.patch_size**3
    else:
        enc_in_ch = cfg.in_channels * cfg._pst * cfg.patch_size**2
    enc = {
        "conv_in": _init_conv(next(ks), enc_in_ch, boc[0], cfg),
        "down_blocks": [],
        "mid_block": [],
        "conv_norm_out": _init_norm(boc[-1], cfg),
    }
    ch = boc[0]
    for i, out_ch in enumerate(boc):
        block = {"res_blocks": []}
        for j in range(lpb):
            block["res_blocks"].append(
                _init_resnet(next(ks), ch if j == 0 else out_ch, out_ch, cfg)
            )
        if i < len(boc) - 1 and 2**i >= cfg.patch_size:
            block["downsample"] = _init_conv(next(ks), out_ch, out_ch, cfg)
        enc["down_blocks"].append(block)
        ch = out_ch
    enc["mid_block"] = [
        _init_resnet(next(ks), boc[-1], boc[-1], cfg) for _ in range(lpb)
    ]
    conv_out_ch = cfg.latent_channels
    if cfg.latent_log_var == "per_channel":
        conv_out_ch *= 2
    elif cfg.latent_log_var == "uniform":
        conv_out_ch += 1
    enc["conv_out"] = _init_conv(next(ks), boc[-1], conv_out_ch, cfg)

    # decoder
    rev = list(reversed(boc))
    if cfg.add_channel_padding:
        dec_out_ch = cfg.out_channels * cfg.patch_size**3
    else:
        dec_out_ch = cfg.out_channels * cfg._pst * cfg.patch_size**2
    dec = {
        "conv_in": _init_conv(next(ks), cfg.latent_channels, rev[0], cfg),
        "mid_block": [
            _init_resnet(next(ks), rev[0], rev[0], cfg) for _ in range(lpb)
        ],
        "up_blocks": [],
        "conv_norm_out": _init_norm(boc[0], cfg),
        "conv_out": _init_conv(next(ks), boc[0], dec_out_ch, cfg),
    }
    prev = rev[0]
    for i, out_ch in enumerate(rev):
        block = {"res_blocks": []}
        for j in range(lpb + 1):
            block["res_blocks"].append(
                _init_resnet(next(ks), prev if j == 0 else out_ch, out_ch, cfg)
            )
        if i < len(boc) - 1 and 2 ** (len(boc) - i - 1) > cfg.patch_size:
            block["upsample"] = _init_conv(next(ks), out_ch, out_ch, cfg)
        dec["up_blocks"].append(block)
        prev = out_ch

    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        from avatar_tpu.models.layers import init_linear

        params["quant_conv"] = init_linear(
            next(ks), 2 * cfg.latent_channels, 2 * cfg.latent_channels
        )
        params["post_quant_conv"] = init_linear(
            next(ks), cfg.latent_channels, cfg.latent_channels
        )
    params["per_channel_statistics"] = {
        "std_of_means": jnp.ones((cfg.latent_channels,)),
        "mean_of_means": jnp.zeros((cfg.latent_channels,)),
    }
    return params


def video_encoder_apply(
    params: dict, cfg: VideoAutoencoderConfig, sample: jnp.ndarray
) -> jnp.ndarray:
    """Encoder.forward (video_autoencoder.py:313-373): returns moments."""
    in_time = sample.shape[1] != 1
    pst = cfg._pst if in_time else 1
    x = patchify_pixels(sample, cfg.patch_size, pst)
    if cfg.patch_size > pst and (pst > 1 or cfg.add_channel_padding):
        # front zero channel pad to patch_size**3 * in_channels
        # (video_autoencoder.py:886-901)
        pad_ch = x.shape[-1] * (cfg.patch_size // pst) - x.shape[-1]
        x = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (pad_ch,), x.dtype), x], axis=-1
        )
    enc = params["encoder"]
    x = _conv(enc["conv_in"], x)
    for block in enc["down_blocks"]:
        for rb in block["res_blocks"]:
            x = _apply_resnet(rb, x, cfg)
        if "downsample" in block:
            x = _downsample(block["downsample"], x, in_time)
    for rb in enc["mid_block"]:
        x = _apply_resnet(rb, x, cfg)
    x = _norm(enc["conv_norm_out"], x, cfg)
    x = jax.nn.silu(x)
    x = _conv(enc["conv_out"], x)
    if cfg.latent_log_var == "uniform":
        last = x[..., -1:]
        x = jnp.concatenate([x, jnp.repeat(last, x.shape[-1] - 2, axis=-1)], -1)
    if "quant_conv" in params:
        x = linear_nd(x, params["quant_conv"]["kernel"],
                      params["quant_conv"].get("bias"))
    return x


def video_decoder_apply(
    params: dict,
    cfg: VideoAutoencoderConfig,
    latents: jnp.ndarray,
    upsample_in_time: bool = True,
) -> jnp.ndarray:
    """Decoder.forward (video_autoencoder.py:480-512)."""
    dec = params["decoder"]
    x = latents
    if "post_quant_conv" in params:
        x = linear_nd(x, params["post_quant_conv"]["kernel"],
                      params["post_quant_conv"].get("bias"))
    x = _conv(dec["conv_in"], x)
    for rb in dec["mid_block"]:
        x = _apply_resnet(rb, x, cfg)
    for block in dec["up_blocks"]:
        for rb in block["res_blocks"]:
            x = _apply_resnet(rb, x, cfg)
        if "upsample" in block:
            x = _upsample(block["upsample"], x, upsample_in_time)
    x = _norm(dec["conv_norm_out"], x, cfg)
    x = jax.nn.silu(x)
    x = _conv(dec["conv_out"], x)
    pst = cfg._pst if upsample_in_time else 1
    if cfg.patch_size > pst and (pst > 1 or cfg.add_channel_padding):
        # keep the leading channels (video_autoencoder.py:905-916)
        keep = int(x.shape[-1] * (pst / cfg.patch_size))
        x = x[..., :keep]
    return unpatchify_pixels(x, cfg.patch_size, pst)


def import_video_autoencoder_state(
    state: Dict[str, np.ndarray], cfg: VideoAutoencoderConfig
) -> dict:
    """torch state dict (plain Conv3d keys; resnets->res_blocks /
    downsamplers.0->downsample remaps already applied by the reference
    loader, causal_video_autoencoder.py:263-267) -> pytree."""
    s = {k: np.asarray(v) for k, v in state.items()}

    def conv(key):
        if f"{key}.weight1" in s:  # DualConv3d (dims=(2,1))
            p = {
                "spatial": {
                    "kernel": jnp.asarray(
                        s[f"{key}.weight1"].transpose(2, 3, 4, 1, 0)
                    )
                },
                "temporal": {
                    "kernel": jnp.asarray(
                        s[f"{key}.weight2"].transpose(2, 3, 4, 1, 0)
                    )
                },
            }
            if f"{key}.bias1" in s:
                p["spatial"]["bias"] = jnp.asarray(s[f"{key}.bias1"])
                p["temporal"]["bias"] = jnp.asarray(s[f"{key}.bias2"])
            return p
        p = {"kernel": jnp.asarray(s[f"{key}.weight"].transpose(2, 3, 4, 1, 0))}
        if f"{key}.bias" in s:
            p["bias"] = jnp.asarray(s[f"{key}.bias"])
        return p

    def lin1x1(key):
        p = {"kernel": jnp.asarray(s[f"{key}.weight"][:, :, 0, 0, 0].T)}
        if f"{key}.bias" in s:
            p["bias"] = jnp.asarray(s[f"{key}.bias"])
        return p

    def norm(key, ch):
        if cfg.norm_layer == "pixel_norm":
            return {}
        return {"scale": jnp.asarray(s[f"{key}.weight"]),
                "bias": jnp.asarray(s[f"{key}.bias"])}

    def resnet(prefix, cin, cout):
        p = {
            "norm1": norm(f"{prefix}.norm1", cin),
            "conv1": conv(f"{prefix}.conv1"),
            "norm2": norm(f"{prefix}.norm2", cout),
            "conv2": conv(f"{prefix}.conv2"),
        }
        if f"{prefix}.conv_shortcut.weight" in s:
            p["conv_shortcut"] = lin1x1(f"{prefix}.conv_shortcut")
        return p

    boc, lpb = cfg.block_out_channels, cfg.layers_per_block
    enc = {
        "conv_in": conv("encoder.conv_in"),
        "down_blocks": [],
        "conv_norm_out": norm("encoder.conv_norm_out", boc[-1]),
        "conv_out": conv("encoder.conv_out"),
    }
    ch = boc[0]
    for i, out_ch in enumerate(boc):
        block = {
            "res_blocks": [
                resnet(f"encoder.down_blocks.{i}.res_blocks.{j}",
                       ch if j == 0 else out_ch, out_ch)
                for j in range(lpb)
            ]
        }
        if f"encoder.down_blocks.{i}.downsample.conv.weight" in s:
            block["downsample"] = conv(f"encoder.down_blocks.{i}.downsample.conv")
        elif f"encoder.down_blocks.{i}.downsample.weight" in s:
            block["downsample"] = conv(f"encoder.down_blocks.{i}.downsample")
        enc["down_blocks"].append(block)
        ch = out_ch
    enc["mid_block"] = [
        resnet(f"encoder.mid_block.res_blocks.{j}", boc[-1], boc[-1])
        for j in range(lpb)
    ]

    rev = list(reversed(boc))
    dec = {
        "conv_in": conv("decoder.conv_in"),
        "mid_block": [
            resnet(f"decoder.mid_block.res_blocks.{j}", rev[0], rev[0])
            for j in range(lpb)
        ],
        "up_blocks": [],
        "conv_norm_out": norm("decoder.conv_norm_out", boc[0]),
        "conv_out": conv("decoder.conv_out"),
    }
    prev = rev[0]
    for i, out_ch in enumerate(rev):
        block = {
            "res_blocks": [
                resnet(f"decoder.up_blocks.{i}.res_blocks.{j}",
                       prev if j == 0 else out_ch, out_ch)
                for j in range(lpb + 1)
            ]
        }
        for key in (f"decoder.up_blocks.{i}.upsample.conv",
                    f"decoder.up_blocks.{i}.upsample"):
            if f"{key}.weight" in s:
                block["upsample"] = conv(key)
                break
        dec["up_blocks"].append(block)
        prev = out_ch

    params = {"encoder": enc, "decoder": dec}
    if "quant_conv.weight" in s:
        params["quant_conv"] = lin1x1("quant_conv")
        params["post_quant_conv"] = lin1x1("post_quant_conv")
    stats = {}
    if "per_channel_statistics.std-of-means" in s:
        stats["std_of_means"] = jnp.asarray(s["per_channel_statistics.std-of-means"])
        stats["mean_of_means"] = jnp.asarray(
            s.get("per_channel_statistics.mean-of-means",
                  np.zeros_like(s["per_channel_statistics.std-of-means"]))
        )
        params["per_channel_statistics"] = stats
    return params
