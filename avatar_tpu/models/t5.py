"""T5 text encoder (PixArt's t5-v1_1-xxl variant), pure JAX.

The reference loads ``transformers.T5EncoderModel`` from
``PixArt-alpha/PixArt-XL-2-1024-MS`` (`/root/reference/ltx_video/training.py:516-530`,
`inference.py` pipeline yaml) and encodes prompts to 256 tokens
(pipeline_ltx_video.py:343-345 — "TPU supports only lengths multiple of 128").

This is a from-scratch JAX implementation of the T5 encoder stack:
T5LayerNorm (rms, no mean subtraction), unscaled attention with shared
relative-position bias from block 0, and gated-gelu feed-forward
(t5-v1_1) or relu (t5-v1.0). Weights import from any HF torch T5
state dict; parity vs the torch implementation is tested in
tests/test_t5.py with a random tiny config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.layers import init_linear, linear
from avatar_tpu.ops.attention import scaled_dot_product_attention


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # or "relu"

    @classmethod
    def from_dict(cls, d: dict) -> "T5Config":
        return cls(
            vocab_size=d.get("vocab_size", 32128),
            d_model=d["d_model"],
            d_kv=d.get("d_kv", 64),
            d_ff=d["d_ff"],
            num_layers=d["num_layers"],
            num_heads=d["num_heads"],
            relative_attention_num_buckets=d.get(
                "relative_attention_num_buckets", 32
            ),
            relative_attention_max_distance=d.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-6),
            feed_forward_proj=d.get("feed_forward_proj", "gated-gelu"),
        )

    @property
    def gated(self) -> bool:
        return "gated" in self.feed_forward_proj

    @property
    def act(self) -> str:
        return self.feed_forward_proj.replace("gated-", "")


def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5LayerNorm: rms without mean subtraction, fp32 variance."""
    dtype = x.dtype
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    out = x.astype(jnp.float32) * (var + eps) ** -0.5
    return (out.astype(dtype) * weight).astype(weight.dtype)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(
    rel_bias_weight: jnp.ndarray,  # [num_buckets, num_heads]
    q_len: int,
    k_len: int,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, num_buckets, max_distance)
    bias = rel_bias_weight[buckets]  # [q, k, heads]
    return bias.transpose(2, 0, 1)[None]  # [1, heads, q, k]


def init_t5_encoder(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    """Random-init params.  ``dtype=jnp.bfloat16`` initializes directly in
    bf16 so T5-XXL (4.76B params) allocates 9.5 GB instead of 19 GB — an
    f32 init of the XXL encoder does not fit v5e HBM at all."""
    ks = jax.random.split(key, cfg.num_layers + 3)
    inner = cfg.num_heads * cfg.d_kv

    def attn(k):
        kk = jax.random.split(k, 4)
        return {
            "q": init_linear(kk[0], cfg.d_model, inner, bias=False, dtype=dtype),
            "k": init_linear(kk[1], cfg.d_model, inner, bias=False, dtype=dtype),
            "v": init_linear(kk[2], cfg.d_model, inner, bias=False, dtype=dtype),
            "o": init_linear(kk[3], inner, cfg.d_model, bias=False, dtype=dtype),
        }

    blocks = []
    for i in range(cfg.num_layers):
        kk = jax.random.split(ks[i], 4)
        block = {
            "attn": attn(kk[0]),
            "attn_norm": jnp.ones((cfg.d_model,), dtype),
            "ff_norm": jnp.ones((cfg.d_model,), dtype),
        }
        if cfg.gated:
            block["ff"] = {
                "wi_0": init_linear(kk[1], cfg.d_model, cfg.d_ff, bias=False,
                                    dtype=dtype),
                "wi_1": init_linear(kk[2], cfg.d_model, cfg.d_ff, bias=False,
                                    dtype=dtype),
                "wo": init_linear(kk[3], cfg.d_ff, cfg.d_model, bias=False,
                                  dtype=dtype),
            }
        else:
            block["ff"] = {
                "wi": init_linear(kk[1], cfg.d_model, cfg.d_ff, bias=False,
                                  dtype=dtype),
                "wo": init_linear(kk[3], cfg.d_ff, cfg.d_model, bias=False,
                                  dtype=dtype),
            }
        blocks.append(block)

    return {
        "shared": jax.random.normal(ks[-1], (cfg.vocab_size, cfg.d_model),
                                    dtype),
        "rel_bias": jax.random.normal(
            ks[-2], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
        ) * jnp.asarray(0.1, dtype),
        "blocks": blocks,
        "final_norm": jnp.ones((cfg.d_model,), dtype),
    }


def t5_encode(
    params: dict,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # [B, L] int32
    attention_mask: Optional[jnp.ndarray] = None,  # [B, L] 1=keep
) -> jnp.ndarray:
    """Returns last_hidden_state [B, L, d_model]."""
    b, l = input_ids.shape
    x = params["shared"][input_ids]
    dtype = x.dtype

    pos_bias = compute_position_bias(
        params["rel_bias"].astype(jnp.float32), l, l,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )  # [1, H, L, L]
    if attention_mask is not None:
        key_bias = jnp.where(attention_mask > 0.5, 0.0, -1e9)[:, None, None, :]
        bias = pos_bias + key_bias
    else:
        bias = jnp.broadcast_to(pos_bias, (b,) + pos_bias.shape[1:])

    for block in params["blocks"]:
        # self-attention sublayer
        h = t5_layer_norm(x, block["attn_norm"], cfg.layer_norm_epsilon)
        a = block["attn"]
        q = linear(a["q"], h)
        k = linear(a["k"], h)
        v = linear(a["v"], h)

        def split(t):
            return t.reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        out = scaled_dot_product_attention(
            split(q), split(k), split(v), mask=bias, scale=1.0, impl="xla"
        )  # T5 uses unscaled dot product (scale folded into init)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, -1)
        x = x + linear(a["o"], out)

        # feed-forward sublayer
        h = t5_layer_norm(x, block["ff_norm"], cfg.layer_norm_epsilon)
        ff = block["ff"]
        if cfg.gated:
            act = jax.nn.gelu(linear(ff["wi_0"], h), approximate=True)
            h = act * linear(ff["wi_1"], h)
        else:
            h = jax.nn.relu(linear(ff["wi"], h))
        x = x + linear(ff["wo"], h)

    return t5_layer_norm(x, params["final_norm"], cfg.layer_norm_epsilon)


def import_t5_state(state: Dict[str, np.ndarray], cfg: T5Config) -> dict:
    """HF torch T5EncoderModel state dict -> params pytree."""
    def lin(key):
        return {"kernel": jnp.asarray(np.ascontiguousarray(state[key].T))}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        block = {
            "attn": {
                "q": lin(f"{pre}.0.SelfAttention.q.weight"),
                "k": lin(f"{pre}.0.SelfAttention.k.weight"),
                "v": lin(f"{pre}.0.SelfAttention.v.weight"),
                "o": lin(f"{pre}.0.SelfAttention.o.weight"),
            },
            "attn_norm": jnp.asarray(state[f"{pre}.0.layer_norm.weight"]),
            "ff_norm": jnp.asarray(state[f"{pre}.1.layer_norm.weight"]),
        }
        if cfg.gated:
            block["ff"] = {
                "wi_0": lin(f"{pre}.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{pre}.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{pre}.1.DenseReluDense.wo.weight"),
            }
        else:
            block["ff"] = {
                "wi": lin(f"{pre}.1.DenseReluDense.wi.weight"),
                "wo": lin(f"{pre}.1.DenseReluDense.wo.weight"),
            }
        blocks.append(block)
    return {
        "shared": jnp.asarray(state["shared.weight"]),
        "rel_bias": jnp.asarray(
            state["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "blocks": blocks,
        "final_norm": jnp.asarray(state["encoder.final_layer_norm.weight"]),
    }


def load_t5_encoder(
    model_name_or_path: str,
    subfolder: str = "text_encoder",
    quantize: Optional[str] = None,
):
    """Load an HF T5 encoder directory (host-side torch/safetensors read).

    Returns (cfg, params). Requires local files or HF cache (zero-egress
    environments must pre-download).

    quantize="w8"/"w8a8" int8-quantizes the block linears on load
    (utils/quantize.py:quantize_t5_params) — T5-XXL weights drop to
    4.76 GB so the encoder can stay HBM-resident beside the DiT+VAE
    (pipeline yaml key ``quantization_text_encoder``). "w8a8" also runs
    the encode on the int8 MXU (22.0 -> 14.0 ms/call pipelined at 256
    tokens on v5e); "w8" is footprint-only."""
    import json
    from pathlib import Path

    root = Path(model_name_or_path)
    if subfolder and (root / subfolder).exists():
        root = root / subfolder
    with open(root / "config.json") as f:
        cfg = T5Config.from_dict(json.load(f))
    state = {}
    from avatar_tpu.utils.safetensors_io import load_safetensors

    files = sorted(root.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors weights under {root}")
    for fpath in files:
        tensors, _ = load_safetensors(fpath)
        state.update(tensors)
    params = import_t5_state(state, cfg)
    if quantize:
        from avatar_tpu.utils.quantize import quantize_t5_params

        # donate: the f32/bf16 source tree is freed as the int8 tree is
        # built (XXL f32 + int8 coresident would not fit v5e HBM)
        params = jax.jit(
            lambda p: quantize_t5_params(p, mode=quantize),
            donate_argnums=0,
        )(params)
    return cfg, params


def encode_prompt(
    params: dict,
    cfg: T5Config,
    tokenizer,
    prompt,
    max_length: int = 256,
) -> tuple:
    """training.py:410-461 / pipeline encode_prompt: tokenize to a fixed
    128-multiple length and run the encoder. Returns (embeds, mask)."""
    if isinstance(prompt, str):
        prompt = [prompt]
    enc = tokenizer(
        prompt,
        padding="max_length",
        max_length=max_length,
        truncation=True,
        add_special_tokens=True,
        return_tensors="np",
    )
    ids = jnp.asarray(enc["input_ids"], dtype=jnp.int32)
    mask = jnp.asarray(enc["attention_mask"], dtype=jnp.float32)
    embeds = t5_encode(params, cfg, ids, mask)
    return embeds, mask
