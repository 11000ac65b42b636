"""Wav2Vec2 audio encoder, pure JAX, with the FaceFormer fork's resampling.

Re-implements the reference's hacked ``Wav2Vec2Model``
(`/root/reference/preprocessing/FaceFormer/wav2vec.py:75-182`): the conv
feature-extractor output is linearly interpolated from 50 Hz to the video
frame rate (30 fps for vocaset, or an explicit frame count) BEFORE the
feature projection and transformer encoder.

Supports the facebook/wav2vec2-base-960h architecture (group-norm feature
extractor, post-LN encoder layers, grouped positional conv with weight
norm); weights import from HF torch state dicts. Golden parity vs the torch
implementation is tested with a random tiny config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import linear
from avatar_tpu.ops.attention import scaled_dot_product_attention
from avatar_tpu.ops.normalization import layer_norm


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "Wav2Vec2Config":
        return cls(
            hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            conv_dim=tuple(d["conv_dim"]),
            conv_stride=tuple(d["conv_stride"]),
            conv_kernel=tuple(d["conv_kernel"]),
            conv_bias=d.get("conv_bias", False),
            feat_extract_norm=d.get("feat_extract_norm", "group"),
            num_conv_pos_embeddings=d.get("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=d.get(
                "num_conv_pos_embedding_groups", 16
            ),
            do_stable_layer_norm=d.get("do_stable_layer_norm", False),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
        )


def _conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias, stride: int,
            padding: int = 0, groups: int = 1) -> jnp.ndarray:
    """x: [B, T, C_in], kernel: [K, C_in/groups, C_out]."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NWC", "WIO", "NWC")
    )
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride,), [(padding, padding)],
        dimension_numbers=dn, feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _group_norm_channels(x: jnp.ndarray, scale, bias, num_groups: int,
                         eps: float = 1e-5) -> jnp.ndarray:
    """torch GroupNorm over [B, T, C] with per-(group over C, all T) stats."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    out = xf.reshape(b, t, c).astype(x.dtype)
    return out * scale + bias


def linear_interpolation(
    features: jnp.ndarray, input_fps: float, output_fps: float,
    output_len: Optional[int] = None,
) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=True) over the time
    axis of [B, T, C] (wav2vec.py:64-72)."""
    b, t, c = features.shape
    if output_len is None:
        output_len = int(t / float(input_fps) * output_fps)
    if output_len == t:
        return features
    if output_len == 1:
        return features[:, :1]
    # align_corners=True: positions map 0..t-1 linearly
    pos = jnp.linspace(0.0, t - 1, output_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo)[None, :, None].astype(features.dtype)
    return features[:, lo] * (1 - w) + features[:, hi] * w


def feature_extractor(params: dict, cfg: Wav2Vec2Config,
                      input_values: jnp.ndarray) -> jnp.ndarray:
    """Raw wav [B, S] -> conv features [B, T, conv_dim[-1]]."""
    x = input_values[..., None]  # [B, S, 1]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        conv = params["conv_layers"][i]
        x = _conv1d(x, conv["kernel"], conv.get("bias"), stride=s)
        if cfg.feat_extract_norm == "group" and i == 0:
            x = _group_norm_channels(
                x, conv["norm_scale"], conv["norm_bias"],
                num_groups=cfg.conv_dim[0],
            )
        elif cfg.feat_extract_norm == "layer":
            x = layer_norm(x, conv["norm_scale"], conv["norm_bias"],
                           eps=cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False)
    return x


def _encoder_layer(params: dict, cfg: Wav2Vec2Config, x: jnp.ndarray,
                   bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Post-LN Wav2Vec2EncoderLayer (do_stable_layer_norm=False)."""
    b, l, _ = x.shape
    heads = cfg.num_attention_heads
    head_dim = cfg.hidden_size // heads
    a = params["attention"]
    q = linear(a["q"], x) * head_dim**-0.5
    k = linear(a["k"], x)
    v = linear(a["v"], x)

    def split(t):
        return t.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)

    attn = scaled_dot_product_attention(
        split(q), split(k), split(v), mask=bias, scale=1.0, impl="xla"
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, l, -1)
    x = x + linear(a["out"], attn)
    x = layer_norm(x, params["layer_norm"]["scale"],
                   params["layer_norm"]["bias"], eps=cfg.layer_norm_eps)
    h = jax.nn.gelu(linear(params["ff"]["intermediate"], x), approximate=False)
    x = x + linear(params["ff"]["output"], h)
    return layer_norm(x, params["final_layer_norm"]["scale"],
                      params["final_layer_norm"]["bias"],
                      eps=cfg.layer_norm_eps)


def wav2vec2_encode(
    params: dict,
    cfg: Wav2Vec2Config,
    input_values: jnp.ndarray,  # [B, S] raw 16 kHz waveform
    output_len: Optional[int] = None,
    output_fps: float = 30.0,
    input_fps: float = 50.0,
) -> jnp.ndarray:
    """FaceFormer-style forward (wav2vec.py:79-182, vocaset path):
    conv features -> 50Hz->fps linear interpolation -> projection -> encoder.
    """
    feats = feature_extractor(params["feature_extractor"], cfg, input_values)
    feats = linear_interpolation(feats, input_fps, output_fps, output_len)

    fp = params["feature_projection"]
    x = layer_norm(feats, fp["layer_norm"]["scale"], fp["layer_norm"]["bias"],
                   eps=cfg.layer_norm_eps)
    x = linear(fp["projection"], x)

    # positional grouped conv with same padding + trim for even kernels
    enc = params["encoder"]
    pad = cfg.num_conv_pos_embeddings // 2
    pos = _conv1d(
        x, enc["pos_conv"]["kernel"], enc["pos_conv"].get("bias"),
        stride=1, padding=pad, groups=cfg.num_conv_pos_embedding_groups,
    )
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = layer_norm(x, enc["layer_norm"]["scale"], enc["layer_norm"]["bias"],
                   eps=cfg.layer_norm_eps)
    for layer in enc["layers"]:
        x = _encoder_layer(layer, cfg, x, bias=None)
    return x


# ---------------------------------------------------------------------------
# Weight import (HF torch Wav2Vec2Model state dict)
# ---------------------------------------------------------------------------


def import_wav2vec2_state(state: Dict[str, np.ndarray],
                          cfg: Wav2Vec2Config) -> dict:
    s = {k: np.asarray(v) for k, v in state.items()}

    def lin(key, bias=True):
        p = {"kernel": jnp.asarray(np.ascontiguousarray(s[f"{key}.weight"].T))}
        if bias and f"{key}.bias" in s:
            p["bias"] = jnp.asarray(s[f"{key}.bias"])
        return p

    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        pre = f"feature_extractor.conv_layers.{i}"
        layer = {
            # torch conv1d [out, in, K] -> [K, in, out]
            "kernel": jnp.asarray(s[f"{pre}.conv.weight"].transpose(2, 1, 0)),
        }
        if f"{pre}.conv.bias" in s:
            layer["bias"] = jnp.asarray(s[f"{pre}.conv.bias"])
        if f"{pre}.layer_norm.weight" in s:
            layer["norm_scale"] = jnp.asarray(s[f"{pre}.layer_norm.weight"])
            layer["norm_bias"] = jnp.asarray(s[f"{pre}.layer_norm.bias"])
        conv_layers.append(layer)

    # pos conv with weight norm: either weight_g/weight_v (old) or
    # parametrizations.weight.original0/original1 (new torch)
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in s:
        g, v = s[f"{base}.weight_g"], s[f"{base}.weight_v"]
    elif f"{base}.parametrizations.weight.original0" in s:
        g = s[f"{base}.parametrizations.weight.original0"]
        v = s[f"{base}.parametrizations.weight.original1"]
    else:
        g, v = None, s[f"{base}.weight"]
    if g is not None:
        norm = np.linalg.norm(v.reshape(-1, v.shape[2]), axis=0)  # per kernel pos
        w = g * v / (norm[None, None, :] + 1e-12)
    else:
        w = v
    pos_conv = {
        "kernel": jnp.asarray(w.transpose(2, 1, 0)),  # [K, in/groups, out]
        "bias": jnp.asarray(s[f"{base}.bias"]),
    }

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layers.append(
            {
                "attention": {
                    "q": lin(f"{pre}.attention.q_proj"),
                    "k": lin(f"{pre}.attention.k_proj"),
                    "v": lin(f"{pre}.attention.v_proj"),
                    "out": lin(f"{pre}.attention.out_proj"),
                },
                "layer_norm": {
                    "scale": jnp.asarray(s[f"{pre}.layer_norm.weight"]),
                    "bias": jnp.asarray(s[f"{pre}.layer_norm.bias"]),
                },
                "ff": {
                    "intermediate": lin(f"{pre}.feed_forward.intermediate_dense"),
                    "output": lin(f"{pre}.feed_forward.output_dense"),
                },
                "final_layer_norm": {
                    "scale": jnp.asarray(s[f"{pre}.final_layer_norm.weight"]),
                    "bias": jnp.asarray(s[f"{pre}.final_layer_norm.bias"]),
                },
            }
        )

    return {
        "feature_extractor": {"conv_layers": conv_layers},
        "feature_projection": {
            "layer_norm": {
                "scale": jnp.asarray(s["feature_projection.layer_norm.weight"]),
                "bias": jnp.asarray(s["feature_projection.layer_norm.bias"]),
            },
            "projection": lin("feature_projection.projection"),
        },
        "encoder": {
            "pos_conv": pos_conv,
            "layer_norm": {
                "scale": jnp.asarray(s["encoder.layer_norm.weight"]),
                "bias": jnp.asarray(s["encoder.layer_norm.bias"]),
            },
            "layers": layers,
        },
    }
