"""int8 quantization for the DiT inference path.

Two modes, both applied at pipeline init only — checkpoints, training, and
LoRA always use full-precision kernels:

**Weight-only ("w8")** — a memory-footprint tool, not a speed tool. The DiT
step's weight matmuls are MXU-compute-bound at the serving operating point
(173-182 TF/s, ~90% MFU at 832 tokens, tools/perf_dit.py), so halving weight
bytes cannot speed them up; XLA hoists the loop-invariant dequant and
materializes bf16 weights once per run. What it buys: 2x smaller HBM
footprint (the 2B DiT drops from ~4 GB to ~2 GB) for multi-model serving.
Quantized linears carry {"kernel_q": int8 [in, out], "scale": [out]}.

**W8A8 ("w8a8")** — a speed tool: dynamic per-token activation quantization
+ int8 x int8 matmuls on the int8 MXU mode (2x the bf16 rate; measured
~215 TOP/s vs ~138 TF/s bf16 through plain XLA `dot_general` with
`preferred_element_type=int32` at DiT shapes on v5e — the round-1 "int8 is
unreachable" finding was an artifact of accumulating in the benchmark loop).
Quantized linears carry {"kernel_q8": int8 [in, out], "scale": [out]} and
``models.layers.linear`` quantizes the activation row-wise on the fly.
Only the per-token block matmuls (attn projections, FF) are converted;
boundary layers (patchify, proj_out, adaln, caption projection, timestep
embedder) stay full precision — they are a rounding error in FLOPs and
matter most for output fidelity. Mean-rel output error per matmul ~1%;
see tests/test_extras.py::test_w8a8_quantization for the end-to-end DiT
tolerance.

No reference equivalent (the reference runs pure bf16/fp32 torch,
inference.py:*); this is a TPU-native capability.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_linear(params: dict, act: bool = False) -> dict:
    """{"kernel": [in,out], bias?} -> int8-kernel params.

    act=False: {"kernel_q", "scale", bias?}   (weight-only; dequant at use)
    act=True:  {"kernel_q8", "scale", bias?}  (W8A8; activations quantized
               per-token at matmul time, int8 MXU dot)
    """
    w = params["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    key = "kernel_q8" if act else "kernel_q"
    out = {key: w_q, "scale": scale.astype(jnp.float32 if act else jnp.bfloat16)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def quantize_conv3d(params: dict) -> dict:
    """{"kernel": [kt,kh,kw,in,out], bias?} -> {"kernel_q8", "scale", bias?}.

    Per-output-channel symmetric int8; consumed by
    ``ops.causal_conv3d.conv3d_params`` (dynamic per-tensor activation
    quant + int8 MXU conv)."""
    w = params["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q8": w_q, "scale": scale.astype(jnp.float32)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def quantize_vae_params(params: dict, min_size: int = 2**16) -> dict:
    """W8A8-quantize the 3D convolutions of a VAE params tree.

    Every conv dict whose 5-D kernel has >= min_size elements goes int8
    (per-out-channel weight scales; activations quantized per-tensor at
    conv time). Linears (attention, time embedders), norms, and
    per_channel_statistics stay full precision. Measured ~1.6x conv
    throughput on v5e (int8 MXU mode); mean-rel output error per conv
    <1% — see tests/test_extras.py::test_w8a8_vae."""

    def walk(node):
        if (
            isinstance(node, dict)
            and "kernel" in node
            and getattr(node["kernel"], "ndim", 0) == 5
        ):
            k = node["kernel"]
            size = 1
            for dim in k.shape:
                size *= int(dim)
            if size >= min_size:
                return quantize_conv3d(node)
            return node
        if isinstance(node, dict):
            return {key: walk(v) for key, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def quantize_t5_params(params: dict, mode: str = "w8") -> dict:
    """int8-quantize the T5 encoder block linears (models/t5.py).

    mode="w8" (default): weight-only int8 — the residency tool. T5-XXL
    drops 9.52 -> 4.76 GB of weights (+0.26 GB bf16 embedding table),
    which fits v5e HBM *beside* the DiT + VAE instead of the
    encode-then-free pattern the bf16 footprint forces (bench.py
    t5_stage). Speed-NEUTRAL for the encode: at M=256 the bf16 matmul's
    HBM ceiling equals its MXU ceiling (~12 ms for the 4.76B weight
    pass), so XLA's fused dequant just shifts the dot from HBM-bound
    (689 GB/s) to compute-bound (173 TF/s) at the same latency
    (xprof-measured on v5e, round 5).

    mode="w8a8": adds dynamic per-token activation quant (int8 MXU dot,
    303 TF/s measured at the encode shapes) — the LATENCY tool, same
    int8 footprint: 256-token encode 22.0 -> 14.0 ms/call pipelined
    (19.0 -> 13.4 ms device-side). bench.py keeps this variant
    HBM-resident for the serving rows.

    Norms, the relative-position bias table, and the ``shared`` embedding
    stay full precision (the embedding is a gather, not a matmul; 0.26 GB
    bf16). Per-out-channel symmetric scales; parity gated in
    tests/test_t5.py::test_t5_int8_quantization.
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quantization mode {mode!r}")
    act = mode == "w8a8"
    blocks = []
    for block in params["blocks"]:
        blocks.append(
            {
                **block,
                "attn": {
                    name: quantize_linear(lin, act=act)
                    for name, lin in block["attn"].items()
                },
                "ff": {
                    name: quantize_linear(lin, act=act)
                    for name, lin in block["ff"].items()
                },
            }
        )
    return {**params, "blocks": blocks}


def _is_linear(node) -> bool:
    return (
        isinstance(node, dict)
        and "kernel" in node
        and getattr(node["kernel"], "ndim", 0) == 2
    )


def quantize_dit_params(
    params: dict, min_size: int = 2**18, mode: str = "w8"
) -> dict:
    """Quantize the large 2D linears in a DiT params tree.

    mode="w8": every linear >= min_size goes weight-only int8.
    mode="w8a8": only the per-token block linears (attn1 q/k/v/out,
    attn2 q/out, FF in/out) go int8-activation int8-weight; the hoisted
    cross-attention k/v (computed once per run on the text context) and all
    boundary layers stay full precision.
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quantization mode {mode!r}")

    def walk(node, act):
        if _is_linear(node):
            k = node["kernel"]
            if int(k.shape[0]) * int(k.shape[1]) >= min_size:
                return quantize_linear(node, act=act)
            return node
        if isinstance(node, dict):
            return {key: walk(v, act) for key, v in node.items()}
        if isinstance(node, list):
            return [walk(v, act) for v in node]
        return node

    if mode == "w8":
        return walk(params, act=False)

    W8A8_BLOCK_LINEARS = {
        ("attn1", "to_q"), ("attn1", "to_k"), ("attn1", "to_v"),
        ("attn1", "to_out"),
        ("attn2", "to_q"), ("attn2", "to_out"),
        ("ff", "proj_in"), ("ff", "proj_out"),
    }
    out = dict(params)
    new_blocks = []
    for block in params["blocks"]:
        nb = {}
        for mod_name, mod in block.items():
            if isinstance(mod, dict):
                nm = dict(mod)
                for lin_name, lin in mod.items():
                    if (mod_name, lin_name) in W8A8_BLOCK_LINEARS and _is_linear(lin):
                        nm[lin_name] = quantize_linear(lin, act=True)
                nb[mod_name] = nm
            else:
                nb[mod_name] = mod
        new_blocks.append(nb)
    out["blocks"] = new_blocks
    return out
