"""FaceFormer audio-to-3D-face-motion model, pure JAX.

Re-design of `/root/reference/preprocessing/FaceFormer/faceformer.py:8-294`:
wav2vec2 audio encoder (50 Hz -> fps interpolation) -> linear 768->64 ->
1-layer transformer decoder with ALiBi-style temporal bias, periodic
positional encoding (period 30), and a hard diagonal audio-alignment
cross-attention mask -> linear 64 -> 15069 (5023 FLAME vertices x 3).

TPU-first autoregression: the reference re-runs the decoder over the whole
growing prefix every frame (O(F^2) full decodes, faceformer.py:209-235).
Because the decoder is causal with a diagonal cross-attention alignment,
position i depends only on embeddings 0..i and memory[i]; the
``lax.scan`` here computes each new position with a single-query decoder
step over a fixed-size buffer — mathematically identical, one compiled
graph, no Python loop.

The ALiBi bias has the closed form bias[h, i, j] = -slope_h * floor((i-j)/period)
for j <= i (derived from init_biased_mask, faceformer.py:8-40).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import linear
from avatar_tpu.models.wav2vec2 import Wav2Vec2Config, wav2vec2_encode
from avatar_tpu.ops.normalization import layer_norm


@dataclass(frozen=True)
class FaceFormerConfig:
    feature_dim: int = 64
    vertice_dim: int = 5023 * 3
    period: int = 30
    n_head: int = 4
    num_identities: int = 8  # train_subjects "F2 F3 F4 M3 M4 M5" (+pad)
    max_seq_len: int = 600
    output_fps: float = 30.0  # vocaset


def alibi_slopes(n_head: int) -> np.ndarray:
    """ALiBi slopes (faceformer.py:9-24)."""

    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n_head).is_integer():
        return np.asarray(pow2(n_head))
    closest = 2 ** math.floor(math.log2(n_head))
    extra = pow2(2 * closest)[0::2][: n_head - closest]
    return np.asarray(pow2(closest) + extra)


def biased_causal_row(
    slopes: jnp.ndarray, i: jnp.ndarray, length: int, period: int
) -> jnp.ndarray:
    """Row i of the biased causal mask: [n_head, length] additive bias,
    -inf for j > i, else -slope * floor((i - j) / period)."""
    j = jnp.arange(length)
    dist = jnp.floor((i - j) / period)
    bias = -slopes[:, None] * dist[None, :]
    return jnp.where(j[None, :] <= i, bias, -jnp.inf)


def periodic_positional_encoding(
    d_model: int, period: int, max_seq_len: int
) -> np.ndarray:
    """PPE table [max_seq_len, d_model] (faceformer.py:56-74)."""
    pe = np.zeros((period, d_model), dtype=np.float32)
    position = np.arange(period, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    reps = max_seq_len // period + 1
    return np.tile(pe, (reps, 1))[: max_seq_len + period]


# ---------------------------------------------------------------------------
# torch-parity decoder layer (nn.TransformerDecoderLayer, post-LN, relu)
# ---------------------------------------------------------------------------


def _mha_single_query(
    p: dict, q_in: jnp.ndarray, kv_in: jnp.ndarray,
    bias_row: Optional[jnp.ndarray], n_head: int,
) -> jnp.ndarray:
    """torch MultiheadAttention with a single query position.

    q_in: [B, d]; kv_in: [B, S, d]; bias_row: [n_head, S] additive or None.
    """
    b, s, d = kv_in.shape
    head = d // n_head
    wq, wk, wv = jnp.split(p["in_proj_weight"], 3, axis=0)  # [d, d] each
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3, axis=0)
    q = (q_in @ wq.T + bq) * head**-0.5  # [B, d]
    k = kv_in @ wk.T + bk  # [B, S, d]
    v = kv_in @ wv.T + bv
    q = q.reshape(b, n_head, head)
    k = k.reshape(b, s, n_head, head).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, n_head, head).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhd,bhsd->bhs", q, k).astype(jnp.float32)
    if bias_row is not None:
        logits = logits + bias_row[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhs,bhsd->bhd", probs, v).reshape(b, d)
    return out @ p["out_proj_weight"].T + p["out_proj_bias"]


def _decoder_layer_single_query(
    p: dict,
    x_i: jnp.ndarray,  # [B, d] query position input (PPE already added)
    x_all: jnp.ndarray,  # [B, F, d] full target buffer (PPE added)
    memory_i: jnp.ndarray,  # [B, d] aligned memory token (vocaset diag mask)
    self_bias_row: jnp.ndarray,  # [n_head, F]
    n_head: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    x = x_i + _mha_single_query(p["self_attn"], x_i, x_all, self_bias_row, n_head)
    x = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=eps)
    x = x + _mha_single_query(
        p["multihead_attn"], x, memory_i[:, None, :], None, n_head
    )
    x = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps=eps)
    h = jax.nn.relu(linear(p["linear1"], x))
    x = x + linear(p["linear2"], h)
    return layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"], eps=eps)


def faceformer_decode(
    params: dict,
    cfg: FaceFormerConfig,
    hidden_states: jnp.ndarray,  # [B, F, feature_dim] projected audio feats
    style_emb: jnp.ndarray,  # [B, feature_dim]
) -> jnp.ndarray:
    """Autoregressive decode -> per-frame decoder features [B, F, d]
    (pre vertice_map_r; the reference's extract_audio_motion_features
    return value, and the predict() path before the output projection)."""
    b, frames, d = hidden_states.shape
    ppe = jnp.asarray(
        periodic_positional_encoding(d, cfg.period, cfg.max_seq_len)[:frames],
        dtype=hidden_states.dtype,
    )
    slopes = jnp.asarray(alibi_slopes(cfg.n_head), dtype=jnp.float32)
    dec = params["decoder_layer"]

    emb0 = jnp.zeros((b, frames, d), hidden_states.dtype)
    emb0 = emb0.at[:, 0].set(style_emb)

    def step(carry, i):
        emb = carry
        x_all = emb + ppe[None]
        bias_row = biased_causal_row(slopes, i, frames, cfg.period)
        out_i = _decoder_layer_single_query(
            dec, x_all[:, i], x_all, hidden_states[:, i], bias_row, cfg.n_head
        )
        # next embedding: vertice_map(vertice_map_r(out_i)) + style
        nxt = linear(params["vertice_map"], linear(params["vertice_map_r"], out_i))
        nxt = nxt + style_emb
        emb = jax.lax.cond(
            i + 1 < frames,
            lambda e: e.at[:, i + 1].set(nxt),
            lambda e: e,
            emb,
        )
        return emb, out_i

    _, outs = jax.lax.scan(step, emb0, jnp.arange(frames))
    return outs.transpose(1, 0, 2)  # [B, F, d]


def faceformer_predict(
    params: dict,
    ff_cfg: FaceFormerConfig,
    w2v_cfg: Wav2Vec2Config,
    audio: jnp.ndarray,  # [B, S] raw 16 kHz waveform
    template: jnp.ndarray,  # [B, vertice_dim]
    one_hot: jnp.ndarray,  # [B, num_identities]
    frame_num: Optional[int] = None,
) -> jnp.ndarray:
    """Faceformer.predict (faceformer.py:202-238): audio -> per-frame FLAME
    vertices [B, F, vertice_dim]."""
    feats = wav2vec2_encode(
        params["audio_encoder"], w2v_cfg, audio,
        output_len=frame_num, output_fps=ff_cfg.output_fps,
    )
    hidden = linear(params["audio_feature_map"], feats)
    style = one_hot @ params["obj_vector"]["kernel"]
    features = faceformer_decode(params, ff_cfg, hidden, style)
    vertices = linear(params["vertice_map_r"], features)
    return vertices + template[:, None, :]


def audio_features_to_caption_embeds(
    features: jnp.ndarray,  # [B, T, feature_dim]
    caption_channels: int = 4096,
) -> jnp.ndarray:
    """Lift FaceFormer audio-motion features into the caption embedding
    space consumed by the DiT's cross-attention.

    This is the "audio -> caption projection" interface of the reference's
    earlier audio-conditioning design: training_deepspeed.py:144-157 and
    validation.py:148-181 feed ``audio_latents`` directly as
    ``encoder_hidden_states``/``prompt_embeds``, which is bit-rotted there
    (64-dim features vs a 4096-dim caption_projection input). The intended
    behavior: place the features in the caption input space (zero-padded to
    caption_channels) so the *trainable* caption_projection
    (training.py:50-74 "lora_audio" strategy) learns the actual mapping.
    """
    b, t, d = features.shape
    assert d <= caption_channels
    return jnp.pad(features, ((0, 0), (0, 0), (0, caption_channels - d)))


def extract_audio_motion_features(
    params: dict,
    ff_cfg: FaceFormerConfig,
    w2v_cfg: Wav2Vec2Config,
    audio: jnp.ndarray,
    frame_num: Optional[int] = None,
) -> jnp.ndarray:
    """faceformer.py:240-294: decoder hidden features with a neutral (zero)
    identity embedding — the "audio latents" of the earlier conditioning
    design (consumed by training_deepspeed.py:144-157 / validation.py:148-181)."""
    feats = wav2vec2_encode(
        params["audio_encoder"], w2v_cfg, audio,
        output_len=frame_num, output_fps=ff_cfg.output_fps,
    )
    hidden = linear(params["audio_feature_map"], feats)
    style = jnp.zeros((audio.shape[0], ff_cfg.feature_dim), hidden.dtype)
    return faceformer_decode(params, ff_cfg, hidden, style)


# ---------------------------------------------------------------------------
# Weight import (vocaset.pth torch checkpoint / torch module state dict)
# ---------------------------------------------------------------------------


def import_faceformer_state(
    state: Dict[str, np.ndarray], w2v_cfg: Wav2Vec2Config
) -> dict:
    """torch Faceformer state dict -> params pytree. Audio-encoder keys are
    delegated to the wav2vec2 importer."""
    from avatar_tpu.models.wav2vec2 import import_wav2vec2_state

    s = {k: np.asarray(v) for k, v in state.items()}
    w2v_state = {
        k[len("audio_encoder."):]: v
        for k, v in s.items()
        if k.startswith("audio_encoder.")
        and "masked_spec_embed" not in k
    }

    def lin(key):
        p = {"kernel": jnp.asarray(np.ascontiguousarray(s[f"{key}.weight"].T))}
        if f"{key}.bias" in s:
            p["bias"] = jnp.asarray(s[f"{key}.bias"])
        return p

    def mha(key):
        return {
            "in_proj_weight": jnp.asarray(s[f"{key}.in_proj_weight"]),
            "in_proj_bias": jnp.asarray(s[f"{key}.in_proj_bias"]),
            "out_proj_weight": jnp.asarray(s[f"{key}.out_proj.weight"]),
            "out_proj_bias": jnp.asarray(s[f"{key}.out_proj.bias"]),
        }

    def norm(key):
        return {
            "scale": jnp.asarray(s[f"{key}.weight"]),
            "bias": jnp.asarray(s[f"{key}.bias"]),
        }

    dec = "transformer_decoder.layers.0"
    return {
        "audio_encoder": import_wav2vec2_state(w2v_state, w2v_cfg),
        "audio_feature_map": lin("audio_feature_map"),
        "vertice_map": lin("vertice_map"),
        "vertice_map_r": lin("vertice_map_r"),
        "obj_vector": {
            "kernel": jnp.asarray(np.ascontiguousarray(s["obj_vector.weight"].T))
        },
        "decoder_layer": {
            "self_attn": mha(f"{dec}.self_attn"),
            "multihead_attn": mha(f"{dec}.multihead_attn"),
            "linear1": lin(f"{dec}.linear1"),
            "linear2": lin(f"{dec}.linear2"),
            "norm1": norm(f"{dec}.norm1"),
            "norm2": norm(f"{dec}.norm2"),
            "norm3": norm(f"{dec}.norm3"),
        },
    }


def load_faceformer(checkpoint_path: str, w2v_cfg: Optional[Wav2Vec2Config] = None):
    """Load the reference vocaset.pth (torch pickle; host-side torch read,
    generate_faceformer_frames.py:90-122)."""
    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() for k, v in state.items()}
    w2v_cfg = w2v_cfg or Wav2Vec2Config()
    return FaceFormerConfig(), w2v_cfg, import_faceformer_state(state, w2v_cfg)
