"""Checkpoint import/export between torch-layout safetensors and our pytrees.

The reference ships three checkpoint layouts (causal_video_autoencoder.py:34-120,
transformer3d.py:294-359):
  1. single-file "Comfy" safetensors with embedded JSON config and
     ``model.diffusion_model.`` / ``vae.`` key prefixes (the format the whole
     avatar flow uses — and the format our exports produce);
  2. diffusers directories (``transformer/``, ``vae/``, ``scheduler/``) with
     the rename tables in diffusers_config_mapping.py:140-174;
  3. VAE dirs with ``autoencoder.pth`` + ``per_channel_statistics.json``
     (torch-pickle; supported only when torch is importable).

Layout transforms (torch -> ours):
  linear  .weight [out, in]            -> kernel [in, out]
  conv3d  .weight [out, in, kt, kh, kw]-> kernel [kt, kh, kw, in, out]
  1x1x1   .weight [out, in, 1, 1, 1]   -> kernel [in, out]   (make_linear_nd)
  norm    .weight/.bias                -> scale/bias
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.dit import DiTConfig
from avatar_tpu.models.vae import (
    VAEConfig,
    _decoder_channel_walk,
    _encoder_channel_walk,
)
from avatar_tpu.utils.safetensors_io import load_safetensors, save_safetensors

# diffusers-format key renames (diffusers_config_mapping.py:140-145)
TRANSFORMER_KEYS_RENAME = {
    "proj_in": "patchify_proj",
    "time_embed": "adaln_single",
    "norm_q": "q_norm",
    "norm_k": "k_norm",
}

VAE_KEYS_RENAME = {
    # diffusers_config_mapping.py:148-174 (order matters: longest first)
    "decoder.up_blocks.3.conv_in": "decoder.up_blocks.7",
    "decoder.up_blocks.3.upsamplers.0": "decoder.up_blocks.8",
    "decoder.up_blocks.3": "decoder.up_blocks.9",
    "decoder.up_blocks.2.upsamplers.0": "decoder.up_blocks.5",
    "decoder.up_blocks.2.conv_in": "decoder.up_blocks.4",
    "decoder.up_blocks.2": "decoder.up_blocks.6",
    "decoder.up_blocks.1.upsamplers.0": "decoder.up_blocks.2",
    "decoder.up_blocks.1": "decoder.up_blocks.3",
    "decoder.up_blocks.0": "decoder.up_blocks.1",
    "decoder.mid_block": "decoder.up_blocks.0",
    "encoder.down_blocks.3": "encoder.down_blocks.8",
    "encoder.down_blocks.2.downsamplers.0": "encoder.down_blocks.7",
    "encoder.down_blocks.2": "encoder.down_blocks.6",
    "encoder.down_blocks.1.downsamplers.0": "encoder.down_blocks.4",
    "encoder.down_blocks.1.conv_out": "encoder.down_blocks.5",
    "encoder.down_blocks.1": "encoder.down_blocks.3",
    "encoder.down_blocks.0.conv_out": "encoder.down_blocks.2",
    "encoder.down_blocks.0.downsamplers.0": "encoder.down_blocks.1",
    "encoder.down_blocks.0": "encoder.down_blocks.0",
    "encoder.mid_block": "encoder.down_blocks.9",
    "conv_shortcut.conv": "conv_shortcut",
    "resnets": "res_blocks",
    "norm3": "norm3.norm",
    "latents_mean": "per_channel_statistics.mean-of-means",
    "latents_std": "per_channel_statistics.std-of-means",
}

PER_CHANNEL_STATISTICS_PREFIX = "per_channel_statistics."


def normalize_diffusers_state(
    state: Dict[str, np.ndarray], kind: str
) -> Dict[str, np.ndarray]:
    """diffusers-directory key naming -> reference ("ours") naming, applying
    the rename tables exactly as the reference does (substring replacement
    per key, table order — transformer3d.py:320-331,
    causal_video_autoencoder.py:248-296).  kind: 'transformer' | 'vae'."""
    table = TRANSFORMER_KEYS_RENAME if kind == "transformer" else VAE_KEYS_RENAME
    out = {}
    for key, value in state.items():
        for old, new in table.items():
            key = key.replace(old, new)
        out[key] = value
    return out


class _TrackedState(dict):
    """dict that records key reads so imports can assert full coverage."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def unused(self):
        return set(self.keys()) - self.consumed


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv3d(w: np.ndarray) -> np.ndarray:
    if w.shape[-3:] == (1, 1, 1):  # make_linear_nd 1x1x1 conv -> linear
        return np.ascontiguousarray(w[:, :, 0, 0, 0].T)
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


# ---------------------------------------------------------------------------
# Transformer import
# ---------------------------------------------------------------------------


def _attn_from_state(state: Dict[str, np.ndarray], prefix: str) -> dict:
    p: Dict[str, Any] = {}
    for name in ("to_q", "to_k", "to_v"):
        p[name] = {"kernel": _t_linear(state[f"{prefix}.{name}.weight"])}
        if f"{prefix}.{name}.bias" in state:
            p[name]["bias"] = state[f"{prefix}.{name}.bias"]
    p["to_out"] = {"kernel": _t_linear(state[f"{prefix}.to_out.0.weight"])}
    if f"{prefix}.to_out.0.bias" in state:
        p["to_out"]["bias"] = state[f"{prefix}.to_out.0.bias"]
    for norm in ("q_norm", "k_norm"):
        if f"{prefix}.{norm}.weight" in state:
            p[norm] = {"scale": state[f"{prefix}.{norm}.weight"]}
            if f"{prefix}.{norm}.bias" in state:
                p[norm]["bias"] = state[f"{prefix}.{norm}.bias"]
    return p


def import_transformer_state(
    state: Dict[str, np.ndarray], cfg: DiTConfig, strict: bool = True
) -> dict:
    """torch state-dict (reference naming) -> DiT params pytree."""
    s = _TrackedState(state)
    params: Dict[str, Any] = {
        "patchify_proj": {
            "kernel": _t_linear(s["patchify_proj.weight"]),
            "bias": s["patchify_proj.bias"],
        },
        "adaln_single": {
            "emb": {
                "linear_1": {
                    "kernel": _t_linear(
                        s["adaln_single.emb.timestep_embedder.linear_1.weight"]
                    ),
                    "bias": s["adaln_single.emb.timestep_embedder.linear_1.bias"],
                },
                "linear_2": {
                    "kernel": _t_linear(
                        s["adaln_single.emb.timestep_embedder.linear_2.weight"]
                    ),
                    "bias": s["adaln_single.emb.timestep_embedder.linear_2.bias"],
                },
            },
            "linear": {
                "kernel": _t_linear(s["adaln_single.linear.weight"]),
                "bias": s["adaln_single.linear.bias"],
            },
        },
        "scale_shift_table": s["scale_shift_table"],
        "proj_out": {
            "kernel": _t_linear(s["proj_out.weight"]),
            "bias": s["proj_out.bias"],
        },
    }
    if "caption_projection.linear_1.weight" in s:
        params["caption_projection"] = {
            "linear_1": {
                "kernel": _t_linear(s["caption_projection.linear_1.weight"]),
                "bias": s["caption_projection.linear_1.bias"],
            },
            "linear_2": {
                "kernel": _t_linear(s["caption_projection.linear_2.weight"]),
                "bias": s["caption_projection.linear_2.bias"],
            },
        }

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        block: Dict[str, Any] = {
            "attn1": _attn_from_state(s, f"{pre}.attn1"),
            "attn2": _attn_from_state(s, f"{pre}.attn2"),
            "ff": {
                "proj_in": {
                    "kernel": _t_linear(s[f"{pre}.ff.net.0.proj.weight"]),
                    "bias": s[f"{pre}.ff.net.0.proj.bias"],
                },
                "proj_out": {
                    "kernel": _t_linear(s[f"{pre}.ff.net.2.weight"]),
                    "bias": s[f"{pre}.ff.net.2.bias"],
                },
            },
            "scale_shift_table": s[f"{pre}.scale_shift_table"],
        }
        for norm in ("norm1", "norm2"):
            if f"{pre}.{norm}.weight" in s:
                block[norm] = {"scale": s[f"{pre}.{norm}.weight"]}
        blocks.append(block)
    params["blocks"] = blocks
    if strict and s.unused():
        raise ValueError(f"Unconsumed transformer checkpoint keys: {sorted(s.unused())[:10]} ...")
    return jax_tree(params)


# ---------------------------------------------------------------------------
# VAE import
# ---------------------------------------------------------------------------


def _conv_from_state(state, prefix) -> dict:
    """CausalConv3d (``.conv`` submodule) or plain conv key."""
    key = f"{prefix}.conv.weight" if f"{prefix}.conv.weight" in state else f"{prefix}.weight"
    p = {"kernel": _t_conv3d(state[key])}
    bkey = key.replace("weight", "bias")
    if bkey in state:
        p["bias"] = state[bkey]
    return p


def _norm_from_state(state, prefix) -> dict:
    p = {}
    if f"{prefix}.weight" in state:
        p["scale"] = state[f"{prefix}.weight"]
    if f"{prefix}.bias" in state:
        p["bias"] = state[f"{prefix}.bias"]
    return p


def _resnet_from_state(state, prefix) -> dict:
    p: Dict[str, Any] = {
        "norm1": _norm_from_state(state, f"{prefix}.norm1"),
        "conv1": _conv_from_state(state, f"{prefix}.conv1"),
        "norm2": _norm_from_state(state, f"{prefix}.norm2"),
        "conv2": _conv_from_state(state, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in state:
        p["conv_shortcut"] = {
            "kernel": _t_conv3d(state[f"{prefix}.conv_shortcut.weight"]),
        }
        if f"{prefix}.conv_shortcut.bias" in state:
            p["conv_shortcut"]["bias"] = state[f"{prefix}.conv_shortcut.bias"]
        p["norm3"] = {
            "scale": state[f"{prefix}.norm3.norm.weight"],
            "bias": state[f"{prefix}.norm3.norm.bias"],
        }
    if f"{prefix}.scale_shift_table" in state:
        p["scale_shift_table"] = state[f"{prefix}.scale_shift_table"]
    for scale_name in ("per_channel_scale1", "per_channel_scale2"):
        if f"{prefix}.{scale_name}" in state:
            p[scale_name] = state[f"{prefix}.{scale_name}"]
    return p


def _timestep_embedder_from_state(state, prefix) -> dict:
    return {
        "linear_1": {
            "kernel": _t_linear(state[f"{prefix}.timestep_embedder.linear_1.weight"]),
            "bias": state[f"{prefix}.timestep_embedder.linear_1.bias"],
        },
        "linear_2": {
            "kernel": _t_linear(state[f"{prefix}.timestep_embedder.linear_2.weight"]),
            "bias": state[f"{prefix}.timestep_embedder.linear_2.bias"],
        },
    }


def _mid_block_from_state(state, prefix, num_layers, has_attn=False) -> dict:
    p: Dict[str, Any] = {
        "res_blocks": [
            _resnet_from_state(state, f"{prefix}.res_blocks.{j}")
            for j in range(num_layers)
        ]
    }
    if f"{prefix}.time_embedder.timestep_embedder.linear_1.weight" in state:
        p["time_embedder"] = _timestep_embedder_from_state(
            state, f"{prefix}.time_embedder"
        )
    if has_attn or f"{prefix}.attention_blocks.0.to_q.weight" in state:
        j = 0
        attn = []
        while f"{prefix}.attention_blocks.{j}.to_q.weight" in state:
            a = _attn_from_state(state, f"{prefix}.attention_blocks.{j}")
            attn.append(a)
            j += 1
        p["attention_blocks"] = attn
    return p


def import_vae_state(
    state: Dict[str, np.ndarray], cfg: VAEConfig, strict: bool = True
) -> dict:
    """torch VAE state-dict (reference naming) -> VAE params pytree."""
    s = _TrackedState(state)

    def import_coder(side: str, walk, blocks_key: str) -> dict:
        p: Dict[str, Any] = {
            "conv_in": _conv_from_state(s, f"{side}.conv_in"),
            "conv_norm_out": _norm_from_state(s, f"{side}.conv_norm_out"),
            "conv_out": _conv_from_state(s, f"{side}.conv_out"),
            "blocks": [],
        }
        for i, (name, bparams, _, _) in enumerate(walk):
            prefix = f"{side}.{blocks_key}.{i}"
            if name in ("res_x", "attn_res_x"):
                p["blocks"].append(
                    _mid_block_from_state(
                        s, prefix, bparams["num_layers"],
                        has_attn=(name == "attn_res_x"),
                    )
                )
            elif name == "res_x_y":
                p["blocks"].append(_resnet_from_state(s, prefix))
            elif name.startswith("compress") and name.endswith("_res"):
                p["blocks"].append({"conv": _conv_from_state(s, f"{prefix}.conv")})
            elif name.startswith("compress"):
                if side == "decoder":  # DepthToSpaceUpsample wraps .conv
                    p["blocks"].append({"conv": _conv_from_state(s, f"{prefix}.conv")})
                else:  # plain strided CausalConv3d
                    p["blocks"].append(_conv_from_state(s, prefix))
            else:
                raise ValueError(name)
        return p

    enc_walk = [(n, bp, i, o) for (n, bp, i, o) in _encoder_channel_walk(cfg)]
    dec_walk = _decoder_channel_walk(cfg)
    params: Dict[str, Any] = {
        "encoder": import_coder("encoder", enc_walk, "down_blocks"),
        "decoder": import_coder("decoder", dec_walk, "up_blocks"),
    }
    if "decoder.timestep_scale_multiplier" in s:
        params["decoder"]["timestep_scale_multiplier"] = s[
            "decoder.timestep_scale_multiplier"
        ]
    if "decoder.last_time_embedder.timestep_embedder.linear_1.weight" in s:
        params["decoder"]["last_time_embedder"] = _timestep_embedder_from_state(
            s, "decoder.last_time_embedder"
        )
        params["decoder"]["last_scale_shift_table"] = s[
            "decoder.last_scale_shift_table"
        ]
    if "latent_norm_out.running_mean" in s:
        params["latent_norm"] = {
            "running_mean": s["latent_norm_out.running_mean"],
            "running_var": s["latent_norm_out.running_var"],
        }
        if "latent_norm_out.num_batches_tracked" in s:
            _ = s["latent_norm_out.num_batches_tracked"]  # consumed, unused

    stats = {}
    for key, ours in (
        (f"{PER_CHANNEL_STATISTICS_PREFIX}std-of-means", "std_of_means"),
        (f"{PER_CHANNEL_STATISTICS_PREFIX}mean-of-means", "mean_of_means"),
    ):
        if key in s:
            stats[ours] = s[key]
    if stats:
        stats.setdefault("mean_of_means", np.zeros_like(stats["std_of_means"]))
        params["per_channel_statistics"] = stats
    if strict and s.unused():
        raise ValueError(f"Unconsumed VAE checkpoint keys: {sorted(s.unused())[:10]} ...")
    return jax_tree(params)


def jax_tree(tree):
    """numpy leaves -> jnp arrays (bf16 preserved)."""
    if isinstance(tree, dict):
        return {k: jax_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [jax_tree(v) for v in tree]
    return jnp.asarray(tree)


# ---------------------------------------------------------------------------
# Single-file checkpoint load (the avatar flow's format)
# ---------------------------------------------------------------------------


def load_single_file_checkpoint(
    path: str | Path,
) -> Tuple[dict, Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Load a Comfy-style single safetensors: returns
    (configs, transformer_state, vae_state) with prefixes stripped
    (transformer3d.py:337-352, causal_video_autoencoder.py:103-120,248-259).
    """
    tensors, metadata = load_safetensors(path)
    configs = json.loads(metadata["config"]) if "config" in metadata else {}
    transformer_state, vae_state = {}, {}
    for k, v in tensors.items():
        if k.startswith("model.diffusion_model."):
            transformer_state[k[len("model.diffusion_model."):]] = v
        elif k.startswith("vae."):
            vae_state[k[len("vae."):]] = v
        elif k.startswith(PER_CHANNEL_STATISTICS_PREFIX):
            vae_state[k] = v
        else:
            transformer_state[k] = v
    return configs, transformer_state, vae_state


def load_checkpoint(path: str | Path):
    """Full load: (dit_cfg, dit_params, vae_cfg, vae_params, scheduler_cfg)."""
    configs, t_state, v_state = load_single_file_checkpoint(path)
    dit_cfg = DiTConfig.from_dict(configs["transformer"])
    vae_cfg = VAEConfig.from_dict(configs["vae"])
    dit_params = import_transformer_state(t_state, dit_cfg)
    vae_params = import_vae_state(v_state, vae_cfg)
    return dit_cfg, dit_params, vae_cfg, vae_params, configs.get("scheduler")


# ---------------------------------------------------------------------------
# Export (torch-layout state dict from our pytrees)
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_transformer_state(params: dict, cfg: DiTConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_transformer_state` (reference key naming, so
    exports load into the torch implementation)."""
    s: Dict[str, np.ndarray] = {}

    def put_linear(key, p):
        s[f"{key}.weight"] = _np(p["kernel"]).T
        if "bias" in p:
            s[f"{key}.bias"] = _np(p["bias"])

    put_linear("patchify_proj", params["patchify_proj"])
    put_linear(
        "adaln_single.emb.timestep_embedder.linear_1",
        params["adaln_single"]["emb"]["linear_1"],
    )
    put_linear(
        "adaln_single.emb.timestep_embedder.linear_2",
        params["adaln_single"]["emb"]["linear_2"],
    )
    put_linear("adaln_single.linear", params["adaln_single"]["linear"])
    if "caption_projection" in params:
        put_linear("caption_projection.linear_1", params["caption_projection"]["linear_1"])
        put_linear("caption_projection.linear_2", params["caption_projection"]["linear_2"])
    s["scale_shift_table"] = _np(params["scale_shift_table"])
    put_linear("proj_out", params["proj_out"])

    for i, block in enumerate(params["blocks"]):
        pre = f"transformer_blocks.{i}"
        for attn_name in ("attn1", "attn2"):
            a = block[attn_name]
            for proj in ("to_q", "to_k", "to_v"):
                put_linear(f"{pre}.{attn_name}.{proj}", a[proj])
            put_linear(f"{pre}.{attn_name}.to_out.0", a["to_out"])
            for norm in ("q_norm", "k_norm"):
                if norm in a:
                    s[f"{pre}.{attn_name}.{norm}.weight"] = _np(a[norm]["scale"])
        put_linear(f"{pre}.ff.net.0.proj", block["ff"]["proj_in"])
        put_linear(f"{pre}.ff.net.2", block["ff"]["proj_out"])
        s[f"{pre}.scale_shift_table"] = _np(block["scale_shift_table"])
        for norm in ("norm1", "norm2"):
            if norm in block:
                s[f"{pre}.{norm}.weight"] = _np(block[norm]["scale"])
    return s


def export_vae_state(params: dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_vae_state` (reference key naming)."""
    s: Dict[str, np.ndarray] = {}

    def put_conv(key, p, causal_wrap=True):
        w = _np(p["kernel"])
        if w.ndim == 2:  # make_linear_nd 1x1x1 conv
            s[f"{key}.weight"] = w.T[:, :, None, None, None]
        else:
            target = f"{key}.conv" if causal_wrap else key
            s[f"{target}.weight"] = w.transpose(4, 3, 0, 1, 2)
            key = target
        if "bias" in p:
            s[f"{key}.bias"] = _np(p["bias"])

    def put_linear(key, p):
        s[f"{key}.weight"] = _np(p["kernel"]).T
        if "bias" in p:
            s[f"{key}.bias"] = _np(p["bias"])

    def put_norm(key, p):
        if "scale" in p:
            s[f"{key}.weight"] = _np(p["scale"])
        if "bias" in p:
            s[f"{key}.bias"] = _np(p["bias"])

    def put_resnet(prefix, p):
        put_norm(f"{prefix}.norm1", p["norm1"])
        put_conv(f"{prefix}.conv1", p["conv1"])
        put_norm(f"{prefix}.norm2", p["norm2"])
        put_conv(f"{prefix}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            s[f"{prefix}.conv_shortcut.weight"] = _np(
                p["conv_shortcut"]["kernel"]
            ).T[:, :, None, None, None]
            if "bias" in p["conv_shortcut"]:
                s[f"{prefix}.conv_shortcut.bias"] = _np(p["conv_shortcut"]["bias"])
            s[f"{prefix}.norm3.norm.weight"] = _np(p["norm3"]["scale"])
            s[f"{prefix}.norm3.norm.bias"] = _np(p["norm3"]["bias"])
        if "scale_shift_table" in p:
            s[f"{prefix}.scale_shift_table"] = _np(p["scale_shift_table"])
        for n in ("per_channel_scale1", "per_channel_scale2"):
            if n in p:
                s[f"{prefix}.{n}"] = _np(p[n])

    def put_embedder(prefix, p):
        put_linear(f"{prefix}.timestep_embedder.linear_1", p["linear_1"])
        put_linear(f"{prefix}.timestep_embedder.linear_2", p["linear_2"])

    def put_mid(prefix, p):
        for j, rb in enumerate(p["res_blocks"]):
            put_resnet(f"{prefix}.res_blocks.{j}", rb)
        if "time_embedder" in p:
            put_embedder(f"{prefix}.time_embedder", p["time_embedder"])
        for j, a in enumerate(p.get("attention_blocks") or []):
            for proj in ("to_q", "to_k", "to_v"):
                put_linear(f"{prefix}.attention_blocks.{j}.{proj}", a[proj])
            put_linear(f"{prefix}.attention_blocks.{j}.to_out.0", a["to_out"])
            for norm in ("q_norm", "k_norm"):
                if norm in a:
                    s[f"{prefix}.attention_blocks.{j}.{norm}.weight"] = _np(
                        a[norm]["scale"]
                    )

    for side, walk, blocks_key in (
        ("encoder", _encoder_channel_walk(cfg), "down_blocks"),
        ("decoder", _decoder_channel_walk(cfg), "up_blocks"),
    ):
        p = params[side]
        put_conv(f"{side}.conv_in", p["conv_in"])
        put_norm(f"{side}.conv_norm_out", p["conv_norm_out"])
        put_conv(f"{side}.conv_out", p["conv_out"])
        for i, (name, bparams, _, _) in enumerate(walk):
            prefix = f"{side}.{blocks_key}.{i}"
            bp = p["blocks"][i]
            if name in ("res_x", "attn_res_x"):
                put_mid(prefix, bp)
            elif name == "res_x_y":
                put_resnet(prefix, bp)
            elif name.startswith("compress") and (
                name.endswith("_res") or side == "decoder"
            ):
                put_conv(f"{prefix}.conv", bp["conv"])
            elif name.startswith("compress"):
                put_conv(prefix, bp)
            else:
                raise ValueError(name)

    dec = params["decoder"]
    if "timestep_scale_multiplier" in dec:
        s["decoder.timestep_scale_multiplier"] = _np(dec["timestep_scale_multiplier"])
    if "last_time_embedder" in dec:
        put_embedder("decoder.last_time_embedder", dec["last_time_embedder"])
        s["decoder.last_scale_shift_table"] = _np(dec["last_scale_shift_table"])
    if "latent_norm" in params:
        s["latent_norm_out.running_mean"] = _np(params["latent_norm"]["running_mean"])
        s["latent_norm_out.running_var"] = _np(params["latent_norm"]["running_var"])
    if "per_channel_statistics" in params:
        st = params["per_channel_statistics"]
        s[f"{PER_CHANNEL_STATISTICS_PREFIX}std-of-means"] = _np(st["std_of_means"])
        s[f"{PER_CHANNEL_STATISTICS_PREFIX}mean-of-means"] = _np(st["mean_of_means"])
    return s


def save_single_file_checkpoint(
    path: str | Path,
    dit_params: dict,
    dit_cfg: DiTConfig,
    vae_state: Optional[Dict[str, np.ndarray]] = None,
    vae_config: Optional[dict] = None,
    scheduler_config: Optional[dict] = None,
) -> None:
    """Write a reference-compatible single-file checkpoint
    (utils/torch_utils.py:39-63,66-102 semantics: config embedded in
    metadata, ``model.diffusion_model.`` prefix on transformer keys)."""
    t_state = export_transformer_state(dit_params, dit_cfg)
    tensors = {f"model.diffusion_model.{k}": v for k, v in t_state.items()}
    configs: Dict[str, Any] = {"transformer": dit_cfg.to_dict()}
    if vae_state is not None:
        # ALL vae keys (incl. per_channel_statistics buffers) must carry the
        # ``vae.`` prefix: the reference's load_state_dict keeps only
        # ``vae.*`` keys whenever any are present
        # (causal_video_autoencoder.py:249-254), so bare stats keys would be
        # silently dropped by a reference-side load of our checkpoint.
        for k, v in vae_state.items():
            tensors[f"vae.{k}"] = v
        configs["vae"] = vae_config
    if scheduler_config is not None:
        configs["scheduler"] = scheduler_config
    save_safetensors(tensors, path, metadata={"config": json.dumps(configs)})
