"""Weight-only int8 quantization: a memory-footprint tool, not a speed tool.

Measured reality on v5e (round 2, tools/perf_dit.py + /tmp/int8_mm bench):
- the DiT step's weight matmuls are MXU-COMPUTE-bound (173-182 TF/s, ~90%
  MFU at 832 tokens), not weight-read-bound, so halving weight bytes cannot
  speed them up;
- int8 x int8 matmuls run at 84-98 TOP/s through both XLA and Pallas
  (vs 110-182 TF/s bf16) — the 394-TOPS int8 MXU mode is not reachable from
  this stack, so W8A8 is not a win either.

What int8 weights still buy: 2x smaller HBM footprint (the 2B DiT drops
from ~4 GB to ~2 GB), which matters for multi-model serving or small-HBM
chips. Quantized linears carry {"kernel_q": int8 [in, out], "scale": [out]}
and are consumed transparently by ``models.layers.linear`` (XLA hoists the
loop-invariant dequant, materializing bf16 weights once per run — so
runtime speed is unchanged, memory is only saved until first use unless
the denoiser is donated). Mean-rel output error ~1.8% on random 2B weights.
Applied at pipeline init only — checkpoints, training, and LoRA always use
full-precision kernels.
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
