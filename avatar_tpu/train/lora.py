"""LoRA for the DiT cross-attention (the reference's "lora_audio" strategy,
`/root/reference/ltx_video/training.py:42-74`): rank-r adapters on every
block's attn2 {to_q, to_k, to_v, to_out}.

Unlike PEFT's module wrapping, the LoRA here is a *parallel params pytree*
consumed by ``dit_apply(lora=..., lora_scale=alpha/rank)``; export merges
the deltas into the base weights (torch_utils.py:66-102 parity) so saved
checkpoints are plain single-file safetensors.
"""

from __future__ import annotations

import zlib
from typing import Sequence

import jax
import jax.numpy as jnp

from avatar_tpu.models.dit import DiTConfig

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def init_lora(
    key: jax.Array,
    cfg: DiTConfig,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    attn: str = "attn2",
    dtype=jnp.float32,
) -> dict:
    """a ~ kaiming-uniform (PEFT default), b = 0 so the initial delta is 0."""
    inner = cfg.inner_dim
    dims = {
        "to_q": (inner, inner),
        "to_k": (cfg.cross_attention_dim, inner),
        "to_v": (cfg.cross_attention_dim, inner),
        "to_out": (inner, inner),
    }
    blocks = []
    for i in range(cfg.num_layers):
        block = {}
        for name in targets:
            d_in, d_out = dims[name]
            # crc32, NOT hash(): Python string hashing is randomized per
            # process (PYTHONHASHSEED), which would give every host of a
            # multi-host job different LoRA init — silent divergence.
            k = jax.random.fold_in(
                jax.random.fold_in(key, i), zlib.crc32(name.encode()) % 2**31
            )
            bound = (3.0 / d_in) ** 0.5  # kaiming_uniform(a=sqrt(5)) on [in, r]
            block[name] = {
                "a": jax.random.uniform(k, (d_in, rank), dtype, -bound, bound),
                "b": jnp.zeros((rank, d_out), dtype),
            }
        blocks.append({attn: block})
    return {"blocks": blocks}


def lora_scale(rank: int, alpha: int) -> float:
    return alpha / rank


def merge_lora(dit_params: dict, lora: dict, scale: float) -> dict:
    """Fold LoRA deltas into base kernels (merge_and_unload parity):
    W' = W + scale * A @ B."""
    merged = jax.tree.map(lambda x: x, dit_params)  # shallow-ish copy
    new_blocks = []
    for block, lora_block in zip(merged["blocks"], lora["blocks"]):
        block = dict(block)
        for attn_name, adapters in lora_block.items():
            attn = dict(block[attn_name])
            for proj, ab in adapters.items():
                p = dict(attn[proj])
                delta = (
                    ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)
                ) * scale
                p["kernel"] = (
                    p["kernel"].astype(jnp.float32) + delta
                ).astype(p["kernel"].dtype)
                attn[proj] = p
            block[attn_name] = attn
        new_blocks.append(block)
    merged["blocks"] = new_blocks
    return merged
