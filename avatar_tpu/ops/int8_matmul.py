"""Pallas W8A8 matmul: int8 x int8 on the MXU with the dequant epilogue
fused in-register.

Status: used by ``models.layers.linear`` for LONG token counts only
(M >= W8A8_PALLAS_MIN_TOKENS). Measured reality on v5e (round 2): at the 832-token serving
point XLA fuses the dequant epilogue into downstream consumers and its
int8 dot runs at ~332 TOP/s in-graph, so this kernel only adds launch
overhead there (14.7 vs 13.3 ms/step) — the plain XLA path stays. At
5376 tokens (512px·161f) XLA STOPS fusing and round-trips the int32
accumulators through HBM (~15 GB/step of convert_element_type); the
in-register dequant here recovers that traffic.

Also a tested standalone building block
(tests/test_ops.py::test_w8a8_matmul_kernel) for quantized GEMM serving.

No reference equivalent (the reference is bf16/fp32 torch throughout).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# PER-SAMPLE sequence-length threshold above which the W8A8 inference
# path leaves XLA's fused int8 dot for the Pallas kernels (quantize_rows
# / fused_rms_mod_quant / fused_act_quant producers + w8a8_matmul).
# Below it XLA fuses the act-quant and dequant epilogues at memory speed
# and the kernels only add launch overhead. Measured on v5e (round 5):
# 832-token sequences -> XLA wins at every measured batch (b1/b2 r2
# finding; b4 = 3328 total tokens was the r4 "w8a8 batch inversion":
# 147.7 vs 157.8 device-fps — an earlier B*N-keyed predicate pushed it
# onto the Pallas path). The fusion breakdown the Pallas path exists for
# is a long-SEQUENCE effect, first seen at 5376 tokens (512px-161f),
# where XLA round-trips ~15 GB/step of int32 accumulators through HBM —
# so routing keys on x.shape[-2] (models/layers.py:linear,
# models/dit.py), keeping batched short sequences on the XLA path at ANY
# batch size while every 512px shape runs the kernels.
W8A8_PALLAS_MIN_TOKENS = 4096


def _kernel(x_q_ref, x_s_ref, w_q_ref, w_s_ref, b_ref, out_ref):
    acc = jnp.dot(
        x_q_ref[:], w_q_ref[:], preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * x_s_ref[:] * w_s_ref[:]
    if b_ref is not None:
        out = out + b_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def _kernel_ksplit(x_q_ref, x_s_ref, w_q_ref, w_s_ref, b_ref, out_ref,
                   acc_ref):
    """K-split variant: accumulate int32 partials in a VMEM scratch over
    the kk grid axis, dequantize once on the last step.  Lets LARGE-K
    shapes (ff_out: K=8192) run big (bm, bn) output tiles whose x/w blocks
    individually fit VMEM — w traffic drops from (M/256)x|W| to
    (M/896)x|W| (336 -> 184 MB at the 5376x8192x2048 shape)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_q_ref[:], w_q_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        out = acc_ref[...].astype(jnp.float32) * x_s_ref[:] * w_s_ref[:]
        if b_ref is not None:
            out = out + b_ref[:]
        out_ref[...] = out.astype(out_ref.dtype)


def _pick_bm(m: int, k: int) -> int:
    # int8 sublane tile is 32. Keep the x block around <=2 MB so the
    # double-buffered (x, w, out) working set stays under the ~16 MB VMEM
    # scoped limit even at K=8192.  Among feasible sizes prefer the one
    # minimizing ragged-edge padding waste (ties -> larger block): 5376
    # rows run 896-row blocks (6 exact, 371 TOP/s) instead of 1024-row
    # blocks (5.25 -> 6 padded, 326 TOP/s) — tools/archive/sweep_512.py.
    cap = max(256, (2 * 2**20) // k)
    if m <= cap:
        return m
    best, best_score = 256, -1.0
    for bm in (1024, 896, 768, 672, 512, 448, 384, 320, 256):
        if bm > cap:
            continue
        score = m / (bm * -(-m // bm))
        if score > best_score:
            best, best_score = bm, score
    return best


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "bm", "bn", "bk")
)
def w8a8_matmul(
    x_q: jnp.ndarray,  # [M, K] int8
    x_s: jnp.ndarray,  # [M, 1] f32 per-row activation scale
    w_q: jnp.ndarray,  # [K, N] int8
    w_s: jnp.ndarray,  # [N] f32 per-column weight scale
    bias: Optional[jnp.ndarray] = None,  # [N]
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    bm: Optional[int] = None,  # block-size overrides (tools/archive/sweep_512.py)
    bn: Optional[int] = None,
    bk: Optional[int] = None,  # K tile; enables the k-split accumulator
) -> jnp.ndarray:
    if interpret is None:  # interpreter mode on CPU (unit tests)
        interpret = jax.default_backend() == "cpu"
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2, (x_q.shape, w_q.shape)
    # Large-K shapes (ff_out: 5376x8192x2048) go through the k-split
    # accumulator: without it the 2 MB x-block cap forces bm=256 and the
    # full 16 MB weight streams M/256 times (260.7 TOP/s measured); with
    # 896x2048 output tiles + bk=1024 the weight traffic drops ~3.5x
    # (measured 316.0 TOP/s; bn=1024 variant 308.9, bk=2048 exceeds the
    # VMEM budget and fails to compile).
    if bk is None and k > 4096 and m >= 2048 and k % 1024 == 0:
        bk = 1024
    if bk is not None and bk < k:
        if bm is None:
            bm = _pick_bm(m, bk)
        if bn is None:
            bn = min(2048, n)
        bm, bn = min(bm, m), min(bn, n)
    else:
        bk = None
        if bm is None:
            bm = _pick_bm(m, k)
        # N tile: keep the (double-buffered) w block around <=2 MB; wider
        # tiles amortize the x-block re-reads (512 -> 1024 at K=2048
        # measured 340 -> 371 TOP/s at the DiT ff_in shape)
        if bn is None:
            bn = min(1024 if k <= 2048 else (512 if k <= 4096 else 256), n)
        bm, bn = min(bm, m), min(bn, n)

    w_s2 = w_s.reshape(1, n).astype(jnp.float32)
    b2 = None if bias is None else bias.reshape(1, n).astype(jnp.float32)
    x_s = x_s.astype(jnp.float32)

    if bk is not None:
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k, bk))
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args = [x_q, x_s, w_q, w_s2]
        if b2 is not None:
            in_specs.append(
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM)
            )
            args.append(b2)
            kern = _kernel_ksplit
        else:
            def kern(x_q_ref, x_s_ref, w_q_ref, w_s_ref, out_ref, acc_ref):
                _kernel_ksplit(x_q_ref, x_s_ref, w_q_ref, w_s_ref, None,
                               out_ref, acc_ref)

        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k,
                bytes_accessed=m * k + k * n + m * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*args)

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x_q, x_s, w_q, w_s2]
    if b2 is not None:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(b2)
        kern = _kernel
    else:
        def kern(x_q_ref, x_s_ref, w_q_ref, w_s_ref, out_ref):
            _kernel(x_q_ref, x_s_ref, w_q_ref, w_s_ref, None, out_ref)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _quant_rows_kernel(x_ref, xq_ref, xs_ref):
    x = x_ref[...].astype(jnp.float32)  # [bm, K]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) / 127.0
    xq_ref[...] = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(
        jnp.int8
    )
    xs_ref[...] = jnp.broadcast_to(s, xs_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_rows_pallas(x: jnp.ndarray, interpret: Optional[bool] = None):
    """Single-pass per-row dynamic int8 quantization: x [M, K] bf16 ->
    (x_q int8 [M, K], x_s f32 [M, 1]) in ONE read of x.

    The XLA expression of the same math runs as separate reduce_max +
    scale-mul + convert passes once the consumer is a custom call (no
    producer fusion): ~20 ms/step at 5376 tokens in the 512px w8a8
    profile. Used by models.layers.linear on the long-sequence path
    feeding :func:`w8a8_matmul`."""
    if interpret is None:  # interpreter mode on CPU (unit tests)
        interpret = jax.default_backend() == "cpu"
    m, k = x.shape
    # ~1M elements per block: the in-kernel f32 upcast lives on the scoped
    # VMEM stack, so bm*k*(2+4+1) bytes plus double buffering must stay
    # under the 16 MB limit (bm=256 @ K=8192 measured 19.9 MB - too big).
    bm = min(m, max(128, (2**20) // k))
    grid = (pl.cdiv(m, bm),)
    x_q, x_s = pl.pallas_call(
        _quant_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return x_q, x_s[:, :1]


class PrequantRows:
    """Activation rows already quantized for :func:`w8a8_matmul`.

    ``models.layers.linear`` accepts this in place of a bf16 array and skips
    its own quant pass — the producer (a fused norm/activation kernel below)
    quantized in-register while it already had the rows in VMEM.  Carries
    the logical [..., K] shape/dtype so `linear` can reshape its output and
    pick the accumulation dtype exactly as for a dense input.
    """

    __slots__ = ("q", "s", "shape", "dtype")

    def __init__(self, q, s, shape, dtype):
        self.q = q          # [M, K] int8
        self.s = s          # [M, 1] f32 per-row scales
        self.shape = shape  # logical (..., K)
        self.dtype = dtype  # activation dtype for the output


jax.tree_util.register_pytree_node(
    PrequantRows,
    lambda p: ((p.q, p.s), (tuple(p.shape), p.dtype)),
    lambda aux, ch: PrequantRows(ch[0], ch[1], aux[0], aux[1]),
)


def _rms_mod_quant_kernel(x_ref, cvec_ref, shift_ref, xq_ref, xs_ref,
                          *, eps: float):
    """rsqrt-normalize rows, apply the folded (norm_scale * (1+ada_scale))
    vector + ada shift, and int8-quantize — one read of x instead of the
    separate norm/modulate/quant passes (~100 MB/block of HBM at 5376
    tokens x 2048 ch)."""
    x = x_ref[0].astype(jnp.float32)  # [bm, C]
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(ms + eps) * cvec_ref[0]
    if shift_ref is not None:
        y = y + shift_ref[0]
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) / 127.0
    xq_ref[0] = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    xs_ref[0] = jnp.broadcast_to(s, xs_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_rms_mod_quant(
    x: jnp.ndarray,       # [B, N, C] activations
    cvec: jnp.ndarray,    # [B, 1, C] folded norm_scale * (1 + ada_scale)
    shift,                # [B, 1, C] ada shift, or None
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> PrequantRows:
    """Fused rms_norm -> AdaLN modulate -> per-row int8 quant.

    Replaces the pre-attention / pre-FF chain of the quantized DiT at long
    sequence lengths (models/dit.py:_block_apply), where the XLA norm +
    modulate fusion and the Pallas quant pass each round-trip the
    [N, 2048] activations through HBM.  Numerics: f32 row stats (matching
    ops/normalization.rms_norm), modulate in f32, then the same
    round-clip-127 quant as :func:`quantize_rows_pallas`."""
    if interpret is None:  # interpreter mode on CPU (unit tests)
        interpret = jax.default_backend() == "cpu"
    b, n, c = x.shape
    bm = min(n, max(128, (2**20) // c))
    cvec = cvec.astype(jnp.float32)
    specs = [
        pl.BlockSpec((1, bm, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, cvec]
    if shift is not None:
        specs.append(pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(shift.astype(jnp.float32))
        kern = functools.partial(_rms_mod_quant_kernel, eps=eps)
    else:
        def kern(x_ref, cvec_ref, xq_ref, xs_ref):
            _rms_mod_quant_kernel(x_ref, cvec_ref, None, xq_ref, xs_ref,
                                  eps=eps)

    x_q, x_s = pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(n, bm)),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, bm, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return PrequantRows(
        x_q.reshape(b * n, c), x_s.reshape(b * n, 128)[:, :1], x.shape,
        x.dtype,
    )


def _gelu_erf(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0**-0.5)))


def _gelu_tanh(x):
    # jax.nn.gelu(approximate=True) formula, f32
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _act_quant_kernel(h_ref, xq_ref, xs_ref, *, act: str, width: int):
    """FF mid-activation (gelu variant or GEGLU gate) + per-row int8 quant
    in one pass over the [N, 4*inner or 8*inner] projections — the widest
    elementwise site in the quantized DiT block (8192 ch at inner 2048)."""
    h = h_ref[0].astype(jnp.float32)  # [bm, C2]
    if act == "geglu":
        y = h[:, :width] * _gelu_erf(h[:, width:])
    elif act == "gelu":
        y = _gelu_erf(h)
    else:  # gelu-approximate
        y = _gelu_tanh(h)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) / 127.0
    xq_ref[0] = jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)
    xs_ref[0] = jnp.broadcast_to(s, xs_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def fused_act_quant(
    h: jnp.ndarray, act: str = "gelu-approximate",
    interpret: Optional[bool] = None,
) -> PrequantRows:
    """h [B, N, C2] FF projection -> activation -> int8 rows.

    ``act``: "gelu-approximate" (tanh; the 2B LTX config), "gelu" (erf), or
    "geglu" (h1 * gelu_erf(h2), output width C2/2) — numerics match
    models/dit.py:_feed_forward's jax.nn.gelu variants in f32."""
    if interpret is None:  # interpreter mode on CPU (unit tests)
        interpret = jax.default_backend() == "cpu"
    b, n, c2 = h.shape
    if act == "geglu":
        assert c2 % 2 == 0, h.shape
        width = c2 // 2
    else:
        width = c2
    bm = min(n, max(128, (2**20) // c2))
    x_q, x_s = pl.pallas_call(
        functools.partial(_act_quant_kernel, act=act, width=width),
        grid=(b, pl.cdiv(n, bm)),
        in_specs=[
            pl.BlockSpec((1, bm, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, bm, width), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, width), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 128), jnp.float32),
        ],
        interpret=interpret,
    )(h)
    return PrequantRows(
        x_q.reshape(b * n, width), x_s.reshape(b * n, 128)[:, :1],
        (b, n, width), h.dtype,
    )


def quantize_rows(x: jnp.ndarray):
    """Per-row (per-token) dynamic int8 quantization. x: [M, K] ->
    (x_q int8 [M, K], x_s f32 [M, 1]). The reduce/round/cast trio is cheap
    (~20 us/block at DiT shapes) and fuses with the producer in XLA."""
    xf = x.astype(jnp.float32)
    x_s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_s = jnp.maximum(x_s, 1e-30)
    x_q = jnp.clip(jnp.round(xf / x_s), -127, 127).astype(jnp.int8)
    return x_q, x_s
