"""Weight-only int8 quantization for inference.

The DiT denoising step is HBM-bandwidth-bound and weight reads are the
largest irreducible term (CLAUDE.md round-2 notes): per-output-channel int8
weights halve that traffic in principle (an isolated dequant-matmul measures
1.5x on the FF shape on v5e). CAVEAT measured in round 1: inside the jitted
denoising loop XLA hoists the loop-invariant dequant and materializes bf16
weights once, so the XLA-only path currently gives ~no end-to-end speedup —
realizing the 1.5x needs a Pallas matmul kernel that dequantizes in-register
from int8 HBM reads (round-2 work; this module provides the format and
accuracy baseline, mean-rel output error ~1.8% on random 2B weights).

Quantized linears carry {"kernel_q": int8 [in, out], "scale": [out]} and are
consumed transparently by ``models.layers.linear``. Applied at pipeline
init only — checkpoints, training, and LoRA always use full-precision
kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_linear(params: dict) -> dict:
    """{"kernel": [in,out], bias?} -> {"kernel_q", "scale", bias?}."""
    w = params["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": w_q, "scale": scale.astype(jnp.bfloat16)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def _is_linear(node) -> bool:
    return (
        isinstance(node, dict)
        and "kernel" in node
        and getattr(node["kernel"], "ndim", 0) == 2
    )


def quantize_dit_params(params: dict, min_size: int = 2**18) -> dict:
    """Quantize every large 2D linear in a DiT params tree (attention
    projections, FF, caption projection); small tensors (norm scales,
    tables, patchify/proj boundary layers under min_size) stay bf16."""

    def walk(node):
        if _is_linear(node):
            k = node["kernel"]
            if int(k.shape[0]) * int(k.shape[1]) >= min_size:
                return quantize_linear(node)
            return node
        if isinstance(node, dict):
            return {key: walk(v) for key, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
