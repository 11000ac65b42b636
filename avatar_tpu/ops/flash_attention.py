"""Pallas TPU flash attention (self- and cross-attention, kv padding masks).

This is the TPU-native replacement for the reference's
``torch_xla.experimental.custom_kernel.flash_attention`` call
(`/root/reference/ltx_video/models/transformers/attention.py:1048-1055`).
Unlike the reference, callers never pad: the wrapper pads q/kv to block
multiples internally and masks the padding, which removes the manual
"pad to 128 / pad to 512" dances at `attention.py:1040-1045` and
`causal_video_autoencoder.py:930-959`.

Forward: classic online-softmax flash attention.
  grid = (B*H, num_q_blocks, num_kv_blocks), kv innermost.
  Scratch (VMEM, fp32): running max m, running sum l, accumulator acc.
  The last kv block writes the normalized output and the per-row
  log-sum-exp (saved for the backward pass).

Backward: fused Pallas kernels (no O(L^2) materialization):
  delta = rowsum(dO * O)                       (plain XLA, elementwise)
  dKV kernel, grid (B*H, nk, nq):  p = exp(s - lse); dV += p^T dO;
    ds = p * (dO V^T - delta) * scale; dK += ds^T Q
  dQ kernel,  grid (B*H, nq, nk):  dQ += ds K
Both recompute p blockwise from the saved lse — memory stays O(L * D).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e: 1024x1024 blocks give ~1.9x over XLA's fused attention at
# L=2640 (DiT inference seq) and ~65 TFLOP/s at L=8192 (see bench notes).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024
# MXU-side softmax denominator (ones-column of v) in the online-softmax
# kernels at d < 128; module flag so tools can A/B it in one process.
_FUSE_L = True
# Backward keeps more live block temporaries; cap blocks lower for VMEM.
DEFAULT_BWD_BLOCK = 512
# tiny-kv (cross-attention) q-block widening cap; swept on v5e at
# Lq=5376 x Lk=256 (see _flash_forward)
_TINY_KV_BLOCK_Q_CAP = 2688
NEG_INF = -1e30
LSE_MASKED = 1e30  # lse placeholder for fully-masked rows -> p == 0 in bwd


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supports(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """Whether the Pallas kernel handles these shapes profitably."""
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    head_dim = q.shape[-1]
    if head_dim % 8 != 0 or head_dim > 512:
        return False
    # Tiny sequences gain nothing from the kernel.
    return q.shape[2] * k.shape[2] >= 128 * 128


def _interpret() -> bool:
    # On CPU (unit tests, debugging) run kernels in interpreter mode.
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# SPMD: shard the kernels over the batch under a device mesh
# ---------------------------------------------------------------------------
#
# pallas_call has NO SPMD partitioning rule: under pjit on a >1-device mesh
# XLA treats the kernel as an opaque custom call and replicates it — every
# device all-gathers the FULL q/k/v and runs the whole batch (on CPU
# interpret mode this also surfaces as "[SPMD] Involuntary full
# rematerialization" warnings from the grid loop's dynamic slices).
# Attention is batch-independent, so when an ambient mesh is installed
# (`with mesh:`) and the batch divides the mesh size, we wrap the kernel in
# shard_map over ALL mesh axes: each device runs only its batch shard and
# the surrounding jit keeps the data-parallel layout end to end.


def _ambient_kernel_mesh(batch: int):
    """The mesh to shard_map a batch-parallel kernel over, or None."""
    # jax._src.mesh is where the `with mesh:` context actually lives; the
    # public pxla.thread_resources alias is deprecated in jax 0.9 (and
    # get_abstract_mesh() only reflects the explicit-sharding use_mesh).
    from jax._src import mesh as mesh_lib

    mesh = mesh_lib.thread_resources.env.physical_mesh
    if mesh is None or mesh.empty or mesh.size <= 1:
        return None
    if batch % mesh.size != 0:
        return None
    try:
        # axis already bound => we are INSIDE a shard_map over this mesh
        # (e.g. Ulysses sequence parallelism) — the kernel is per-shard.
        jax.lax.axis_index(mesh.axis_names[0])
        return None
    except Exception:
        return mesh


def _shard_batched_call(mesh, fn, *args):
    """shard_map fn over dim 0 of every array arg (batch), replicating
    args whose leading dim doesn't shard; output is batch-sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    specs = tuple(
        P(axes) if a.shape[0] % mesh.size == 0 and a.shape[0] > 1 else P()
        for a in args
    )
    wrapped = shard_map(fn, mesh=mesh, in_specs=specs,
                        out_specs=P(axes), check_vma=False)
    return wrapped(*args)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _extend_v_ones(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """[Bk, d < 128] -> [Bk, 128]: v zero-padded with column ``d`` set to 1,
    so ``dot(p, v_ext)[:, d]`` accumulates the softmax denominator on the
    MXU.  At d < 128 the PV pass covers 128 output lanes either way, so the
    row-sum (and its scratch broadcast-stores) leaves the VPU for free —
    ~1 of the ~5 VPU ops per logit element in the online-softmax kernels."""
    vp = jnp.pad(v, ((0, 0), (0, 128 - d)))
    lane = jax.lax.broadcasted_iota(jnp.int32, vp.shape, 1)
    return jnp.where(lane == d, jnp.asarray(1, vp.dtype), vp)


def _fwd_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    mask_ref,  # [1, 1, Bk] fp32 keep mask (1=attend) or None
    o_ref,  # [1, Bq, D]
    lse_ref,  # [1, 1, Bq] fp32
    *scratch,  # fuse_l: (m [Bq,128], acc [Bq,128]); else (m, l, acc [Bq,D])
    scale: float,
    num_kv_blocks: int,
    fuse_l: bool = False,
):
    kv_idx = pl.program_id(2)
    if fuse_l:
        m_scratch, acc_scratch = scratch
        l_scratch = None
    else:
        m_scratch, l_scratch, acc_scratch = scratch
    d = v_ref.shape[-1]

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        if l_scratch is not None:
            l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # bf16 (or f32) multiplies with f32 accumulation on the MXU; a pow2
    # scale is pre-folded into q by _flash_forward (exact), other scales
    # are applied to the f32 logits to preserve low-precision mantissas.
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk] f32
    if scale != 1.0:
        s = s * scale

    keep = None
    if mask_ref is not None:
        keep = mask_ref[0, 0]  # [Bk]
        s = s + jnp.where(keep > 0.5, 0.0, NEG_INF)[None, :]

    m_prev = m_scratch[:][:, :1]  # [Bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [Bq, 1]
    m_next = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_next)  # [Bq, Bk]
    if keep is not None:
        # A fully-masked block yields s == m_next == NEG_INF and p == 1;
        # zero those probabilities explicitly.
        p = p * jnp.where(keep > 0.5, 1.0, 0.0)[None, :]
    alpha = jnp.exp(m_prev - m_next)  # [Bq, 1]
    pb = p.astype(v_ref.dtype)

    if fuse_l:
        # acc columns [:d] = PV, column d = l; the alpha rescale applies
        # to both (l_next = l_prev * alpha + rowsum(p) drops out exactly).
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            pb, _extend_v_ones(v_ref[0], d), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        l_prev = l_scratch[:][:, :1]
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            pb, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, D] f32
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        l_scratch[:] = jnp.broadcast_to(l_next, l_scratch.shape)
    m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        m = m_scratch[:][:, :1]
        if fuse_l:
            l = acc_scratch[:][:, d:d + 1]
            acc = acc_scratch[:][:, :d]
        else:
            l = l_scratch[:][:, :1]
            acc = acc_scratch[:]
        # Fully-masked rows (l == 0) produce 0 output instead of NaN, and an
        # lse sentinel that keeps the backward p at exactly 0.
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, LSE_MASKED, m + jnp.log(l_safe))  # [Bq, 1]
        lse_ref[0, 0] = lse[:, 0]


def _fwd_kernel_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch,
                       scale, num_kv_blocks, fuse_l=False):
    _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, *scratch,
                scale=scale, num_kv_blocks=num_kv_blocks, fuse_l=fuse_l)


# Logit clamp for the bounded (max-free) kernel: rms qk-norm bounds |s| by
# ~scale * d * max|gamma_q| * max|gamma_k| (= 8 for the LTX 2B's unit-scale
# norms at head_dim 64), far below f32 exp overflow; the clamp is a pure
# safety net and fuses into the exp input.
BOUNDED_LOGIT_CLAMP = 80.0


def _fwd_kernel_bounded(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *scratch,
    scale: float, num_kv_blocks: int, fuse_l: bool = False,
):
    """Max-free online softmax for qk-normed attention: rms q/k norms bound
    the logits (|s| <= ~8 for the 2B DiT), so the running max, its
    re-scaling of the accumulator, and one full subtract pass are all
    unnecessary — sum exp(s) directly and divide once at the end. Measured
    48 -> 88 TF/s at L=5376 / head_dim 64 on v5e (the K=64 MXU ceiling is
    ~98). lse = log(l) keeps the backward kernels' p = exp(s - lse) exact.

    ``fuse_l``: d < 128 — the denominator rides the PV matmul as a
    ones-column of v (see :func:`_extend_v_ones`); with the pow2 scale
    pre-folded into q the per-logit VPU work drops to exp+clamp+cast
    (80.5 -> 87 TF/s at L=5376 on v5e, tools/archive/sweep_512.py)."""
    kv_idx = pl.program_id(2)
    if fuse_l:
        (acc_scratch,) = scratch
        l_scratch = None
    else:
        l_scratch, acc_scratch = scratch
    d = v_ref.shape[-1]

    @pl.when(kv_idx == 0)
    def _init():
        if l_scratch is not None:
            l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk] f32
    if scale != 1.0:
        s = s * scale

    p = jnp.exp(jnp.minimum(s, BOUNDED_LOGIT_CLAMP))
    if mask_ref is not None:
        keep = mask_ref[0, 0]  # [Bk]
        p = p * jnp.where(keep > 0.5, 1.0, 0.0)[None, :]
    pb = p.astype(v_ref.dtype)
    if fuse_l:
        acc_scratch[:] += jax.lax.dot_general(
            pb, _extend_v_ones(v_ref[0], d), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        l_scratch[:] += jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_scratch.shape
        )
        acc_scratch[:] += jax.lax.dot_general(
            pb, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        if fuse_l:
            l = acc_scratch[:][:, d:d + 1]
            acc = acc_scratch[:][:, :d]
        else:
            l = l_scratch[:][:, :1]
            acc = acc_scratch[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, LSE_MASKED, jnp.log(l_safe))  # [Bq, 1]
        lse_ref[0, 0] = lse[:, 0]


def _fwd_kernel_bounded_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch,
                               scale, num_kv_blocks, fuse_l=False):
    _fwd_kernel_bounded(q_ref, k_ref, v_ref, None, o_ref, lse_ref, *scratch,
                        scale=scale, num_kv_blocks=num_kv_blocks,
                        fuse_l=fuse_l)


def _fwd_kernel_dense_bias(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_kv_blocks: int,
):
    """Online-softmax forward with a dense additive bias block
    [1, Bq, Bk] — the general mask/bias case the reference prepares at
    `attention.py:825-932` and round 2 still sent to the XLA fallback.
    Entries biased to <= NEG_INF/2 are treated as fully masked (p = 0),
    so -inf-style padding biases behave like keep-masks."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]  # [Bq, Bk] f32

    m_prev = m_scratch[:][:, :1]
    l_prev = l_scratch[:][:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_next)
    # fully-masked entries (-inf bias): exp(s - m_next) can hit exp(0)=1
    # when the whole block is masked; zero them explicitly
    p = jnp.where(s > NEG_INF / 2, p, 0.0)
    alpha = jnp.exp(m_prev - m_next)
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_next, l_scratch.shape)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        m = m_scratch[:][:, :1]
        l = l_scratch[:][:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, LSE_MASKED, m + jnp.log(l_safe))
        lse_ref[0, 0] = lse[:, 0]


def _pick_block(length: int, default: int) -> int:
    """Block size <= default (multiple of 128) maximizing throughput:
    measured per-block efficiency (>=512 full speed, 256 ~0.45x, 128
    ~0.21x on v5e) times useful/padded rows.  An exactly-dividing large
    block wins outright (5376 -> 896, no padding); for awkward lengths
    (e.g. 128*prime, where only 128 divides) a large block with one
    partly-padded grid step beats the 128-row degenerate choice by ~4x
    (ADVICE r2 item 2)."""
    padded = _round_up(length, 128)
    eff = {128: 0.21, 256: 0.45, 384: 0.8}
    best, best_score = min(default, padded), -1.0
    for blk in range(128, min(default, padded) + 1, 128):
        score = eff.get(blk, 1.0) * length / _round_up(length, blk)
        if score >= best_score:  # ties -> the larger block
            best, best_score = blk, score
    return best


def _fwd_kernel_single(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                       scale: float):
    """Whole-row attention for short sequences: one (batch*head) per grid
    step, the full [Lq, Lk] logits stay in VMEM/registers — no online-softmax
    scratch, no m/l running state, ~1 kernel instead of XLA's 5-op chain that
    round-trips the fp32 logits through HBM (measured ~230us/block on v5e at
    L=832; this kernel is the DiT inference fast path)."""
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Lq, Lk] f32

    keep = None
    if mask_ref is not None:
        keep = mask_ref[0, 0]  # [Lk]
        s = s + jnp.where(keep > 0.5, 0.0, NEG_INF)[None, :]

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if keep is not None:
        p = p * jnp.where(keep > 0.5, 1.0, 0.0)[None, :]
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Lq, D] f32
    o_ref[0] = (pv / l_safe).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, LSE_MASKED, m + jnp.log(l_safe))
    lse_ref[0, 0] = lse[:, 0]


def _fwd_kernel_single_nomask(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    _fwd_kernel_single(q_ref, k_ref, v_ref, None, o_ref, lse_ref, scale=scale)


def _pad_inputs(q, k, v, kv_mask, block_q, block_kv):
    batch, heads, lq, d = q.shape
    lk = k.shape[2]
    block_q = _pick_block(lq, block_q)
    block_kv = _pick_block(lk, block_kv)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_kv)

    if kv_mask is None and lk_pad != lk:
        kv_mask = jnp.ones((batch, lk), dtype=jnp.float32)
    if kv_mask is not None:
        kv_mask = jnp.pad(
            kv_mask.astype(jnp.float32), ((0, 0), (0, lk_pad - lk))
        )

    q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))

    bh = batch * heads
    return (
        q.reshape(bh, lq_pad, d),
        k.reshape(bh, lk_pad, d),
        v.reshape(bh, lk_pad, d),
        kv_mask,
        block_q, block_kv, lq_pad, lk_pad,
    )


def _flash_forward(q, k, v, kv_mask, scale, block_q, block_kv,
                   with_lse: bool = False, bounded: bool = False):
    batch, heads, lq, d = q.shape
    # Fold a power-of-two scale into q before the kernel: one [L, D] mul
    # (fused into the pad copy by XLA) instead of a [Bq, Bk] f32 mul per
    # grid step.  Exact for pow2 scales (bf16 exponent shift — head_dim 64
    # gives scale = 0.125), so the saved lse and the backward kernels'
    # s = (q @ k) * scale recompute stay bit-consistent.
    if scale > 0.0 and math.frexp(scale)[0] == 0.5 and scale != 1.0:
        q = q * jnp.asarray(scale, q.dtype)
        scale = 1.0
    qp, kp, vp, maskp, block_q, block_kv, lq_pad, lk_pad = _pad_inputs(
        q, k, v, kv_mask, block_q, block_kv
    )
    if bounded and lq_pad > block_q:
        # Widen the kv block on the bounded (max-free) path: fewer
        # accumulator passes per q row.  Measured at L=5376 (512px·161f):
        # 896x896 -> 896x2688 is 2.96 -> 2.80 ms (84 TF/s).  Budget keeps
        # the f32 logits tile + bf16 p copy within v5e VMEM (896x2688 f32 =
        # 9.6 MB compiles; 1792x2688 does not).
        widest = lk_pad // block_kv
        for mult in range(widest, 1, -1):
            wide = block_kv * mult
            if (widest % mult == 0 and wide <= 2688
                    and block_q * wide <= 896 * 2688):
                block_kv = wide
                break
    if lk_pad <= 256 and lq_pad > block_q:
        # Tiny-kv shapes (DiT cross-attention: Lk=256 caption tokens):
        # widen block_q toward _TINY_KV_BLOCK_Q_CAP (largest divisor of
        # lq_pad) so fewer programs amortize per-program fixed cost.
        # v5e sweep at Lq=5376 (same session): bq 896/1344/1792/2688 =
        # 402/398/365/351 us — cap 2688 wins; the whole-q single-pass
        # variant (bq=5376, no online scratch) measured WORSE (478 us:
        # the materialized [Lq, Lk] f32 softmax chain is VMEM-pass-bound).
        for mult in range(lq_pad // block_q, 1, -1):
            wide = block_q * mult
            if (lq_pad // block_q) % mult == 0 and wide <= _TINY_KV_BLOCK_Q_CAP:
                block_q = wide
                break
    bh = batch * heads
    num_q_blocks = lq_pad // block_q
    num_kv_blocks = lk_pad // block_kv

    if num_q_blocks == 1 and num_kv_blocks == 1:
        # Short-sequence fast path: whole-row softmax in one grid step.
        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [qp, kp, vp]
        if maskp is not None:
            in_specs.append(
                pl.BlockSpec((1, 1, block_kv),
                             lambda b, h=heads: (b // h, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(maskp[:, None, :])
            kernel = functools.partial(_fwd_kernel_single, scale=scale)
        else:
            kernel = functools.partial(_fwd_kernel_single_nomask, scale=scale)
        out, lse = pl.pallas_call(
            kernel,
            interpret=_interpret(),
            grid=(bh,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, block_q, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(*args)
        out = out.reshape(batch, heads, lq_pad, d)[:, :, :lq, :]
        if with_lse:
            return out, lse
        return out

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if maskp is not None:
        # Broadcast per-batch mask across heads via the index map; the mask
        # is [B, 1, Lk] so block dims satisfy TPU (sublane, lane) tiling.
        in_specs.append(
            pl.BlockSpec((1, 1, block_kv),
                         lambda b, i, j, h=heads: (b // h, 0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(maskp[:, None, :])
        kernel = functools.partial(
            _fwd_kernel_bounded if bounded else _fwd_kernel,
            scale=scale, num_kv_blocks=num_kv_blocks,
            fuse_l=_FUSE_L and d < 128,
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_bounded_nomask if bounded else _fwd_kernel_nomask,
            scale=scale, num_kv_blocks=num_kv_blocks,
            fuse_l=_FUSE_L and d < 128,
        )

    out, lse = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ),
        scratch_shapes=(
            # bounded: (l if not fused) + acc; unbounded: m + (l) + acc.
            # With fuse_l the acc widens to 128 columns (col d carries l).
            ([] if bounded else [pltpu.VMEM((block_q, 128), jnp.float32)])
            + ([] if _FUSE_L and d < 128
               else [pltpu.VMEM((block_q, 128), jnp.float32)])
            + [pltpu.VMEM(
                (block_q, 128 if _FUSE_L and d < 128 else d), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*args)

    out = out.reshape(batch, heads, lq_pad, d)[:, :, :lq, :]
    if with_lse:
        return out, lse  # lse stays padded [bh, 1, lq_pad]
    return out


# ---------------------------------------------------------------------------
# Token-major fused attention (short sequences)
# ---------------------------------------------------------------------------


def _token_major_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                        scale: float, head_dim: int,
                        bounded: bool = False):
    """Token-major short-sequence attention: each grid step covers one batch
    element and a 128-column group of heads (Mosaic requires lane-dim blocks
    divisible by 128, so head_dim-64 heads are processed two at a time);
    callers never transpose to [B, H, L, D] and back (2 relayouts of the full
    activation per attention saved).  Full-row softmax, logits never leave
    VMEM."""
    keep = None
    if mask_ref is not None:
        keep = mask_ref[0, 0]  # [Lk]
    width = q_ref.shape[-1]
    for h in range(width // head_dim):
        lo = h * head_dim
        qh = q_ref[0][:, lo:lo + head_dim]
        kh = k_ref[0][:, lo:lo + head_dim]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Lq, Lk] f32
        if bounded:
            # qk-norm bounds |s| far below the f32 exp limit: skip the
            # max pass entirely (one fewer [Lq, Lk] reduction per head)
            p = jnp.exp(jnp.minimum(s, BOUNDED_LOGIT_CLAMP))
        else:
            if keep is not None:
                s = s + jnp.where(keep > 0.5, 0.0, NEG_INF)[None, :]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        if keep is not None:
            p = p * jnp.where(keep > 0.5, 1.0, 0.0)[None, :]
        l = jnp.sum(p, axis=-1, keepdims=True)
        l = jnp.where(l == 0.0, 1.0, l)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, lo:lo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo:lo + head_dim] = (pv / l).astype(o_ref.dtype)


def _token_major_kernel_nomask(q_ref, k_ref, v_ref, o_ref, *, scale,
                               head_dim, bounded=False):
    _token_major_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale,
                        head_dim=head_dim, bounded=bounded)


def _heads_per_block(heads: int, head_dim: int, max_width: int = 256):
    """Largest head-group size whose column width satisfies Mosaic's lane
    tiling (width % 128 == 0, or the group covers every head).  Groups up
    to ``max_width`` lanes: fewer grid steps pipeline better (measured
    49 -> 42 us/call on the 832x256 cross-attention at head_dim 64 on
    v5e); wider groups pressure scoped VMEM when the per-head logits are
    large, so callers pass max_width=128 near the VMEM cap."""
    for hpb in range(min(heads, max(1, max_width // head_dim)), 0, -1):
        if heads % hpb:
            continue
        width = hpb * head_dim
        if width % 128 == 0 or hpb == heads:
            return hpb
    return None


def fused_supports(lq: int, lk: int, heads: int, head_dim: int, dtype) -> bool:
    """Token-major fused path: short sequences whose full [Lq, Lk] logits fit
    comfortably in VMEM, sublane-aligned lengths (no padding logic here),
    MXU-friendly head dim."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    return (
        head_dim % 8 == 0
        and head_dim <= 256
        and _heads_per_block(heads, head_dim) is not None
        and lq % sub == 0
        and lk % sub == 0
        and lq * lk * 4 <= 6 * 1024 * 1024
    )


def _fused_fwd_impl(q, k, v, kv_mask, heads, scale, bounded=False):
    b, lq, c = q.shape
    lk = k.shape[1]
    hd = c // heads
    # Halve the group width when the per-head f32 logits exceed 3 MB —
    # inputs scale with width and the scoped-VMEM budget is 16 MB.
    hpb = _heads_per_block(heads, hd,
                           max_width=256 if lq * lk * 4 <= 3 * 2**20 else 128)
    width = hpb * hd
    qspec = pl.BlockSpec((1, lq, width), lambda i, g: (i, 0, g),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, lk, width), lambda i, g: (i, 0, g),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if kv_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, lk), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(kv_mask.astype(jnp.float32)[:, None, :])
        kernel = functools.partial(_token_major_kernel, scale=scale,
                                   head_dim=hd, bounded=bounded)
    else:
        kernel = functools.partial(_token_major_kernel_nomask, scale=scale,
                                   head_dim=hd, bounded=bounded)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(b, heads // hpb),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, lq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*args)


def _rope_token_kernel(q1_ref, q2_ref, k1_ref, k2_ref, cos_ref, sin_ref,
                       v_ref, o_ref, *, scale: float, head_dim: int,
                       bounded: bool = False):
    """Token-major attention with RoPE applied in-kernel on the split-half
    layout: q/k arrive as the two contiguous halves straight from the
    (permuted) projections — no rope elementwise pass, no head-major
    relayout ever materializes in HBM.  One (batch, head-group) per grid
    step, whole-row softmax in VMEM."""
    c = cos_ref[0]
    s = sin_ref[0]
    q1, q2 = q1_ref[0], q2_ref[0]
    k1, k2 = k1_ref[0], k2_ref[0]
    qr1 = q1 * c - q2 * s
    qr2 = q2 * c + q1 * s
    kr1 = k1 * c - k2 * s
    kr2 = k2 * c + k1 * s
    hd2 = head_dim // 2
    for j in range(q1.shape[-1] // hd2):
        lo = j * hd2
        qh = jnp.concatenate([qr1[:, lo:lo + hd2], qr2[:, lo:lo + hd2]], -1)
        kh = jnp.concatenate([kr1[:, lo:lo + hd2], kr2[:, lo:lo + hd2]], -1)
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bounded:
            p = jnp.exp(jnp.minimum(sc, BOUNDED_LOGIT_CLAMP))
        else:
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        vlo = j * head_dim
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, vlo:vlo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, vlo:vlo + head_dim] = (pv / l).astype(o_ref.dtype)


def _rope_heads_per_block(heads: int, hd2: int):
    # smallest valid group: VMEM per grid step scales with group width
    for hpb in range(1, heads + 1):
        if heads % hpb:
            continue
        if (hpb * hd2) % 128 == 0 or hpb == heads:
            return hpb
    return None


def rope_fused_supports(lq: int, heads: int, head_dim: int, dtype) -> bool:
    sub = 16 if dtype == jnp.bfloat16 else 8
    return (
        head_dim % 16 == 0
        and head_dim <= 256
        and _rope_heads_per_block(heads, head_dim // 2) is not None
        and lq % sub == 0
        and lq * lq * 4 <= 6 * 1024 * 1024
    )


def _rope_fused_impl(q, k, v, cos_s, sin_s, heads, scale, bounded=False):
    b, lq, c = q.shape
    hd = c // heads
    hd2 = hd // 2
    hpb = _rope_heads_per_block(heads, hd2)
    half = c // 2
    halfspec = pl.BlockSpec((1, lq, hpb * hd2), lambda i, g: (i, 0, g),
                            memory_space=pltpu.VMEM)
    fullspec = pl.BlockSpec((1, lq, hpb * hd), lambda i, g: (i, 0, g),
                            memory_space=pltpu.VMEM)
    args = [q[..., :half], q[..., half:], k[..., :half], k[..., half:],
            cos_s, sin_s, v]
    return pl.pallas_call(
        functools.partial(_rope_token_kernel, scale=scale, head_dim=hd,
                          bounded=bounded),
        interpret=_interpret(),
        grid=(b, heads // hpb),
        in_specs=[halfspec] * 6 + [fullspec],
        out_specs=fullspec,
        out_shape=jax.ShapeDtypeStruct((b, lq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*args)


def _rope_fused_ref(q, k, v, cos_s, sin_s, heads, scale):
    """jnp reference / backward recompute: split-half rope + head grouping
    identical to models.dit's split_to_head_major path."""
    from avatar_tpu.ops.rope import apply_rotary_emb_split

    b, lq, c = q.shape
    hd = c // heads

    def to_head_major(t):
        t = t.reshape(b, lq, 2, heads, hd // 2)
        return t.transpose(0, 1, 3, 2, 4).reshape(b, lq, c)

    q = to_head_major(apply_rotary_emb_split(q, (cos_s, sin_s)))
    k = to_head_major(apply_rotary_emb_split(k, (cos_s, sin_s)))
    return _fused_ref(q, k, v, None, heads, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _rope_fused_cvjp(q, k, v, cos_s, sin_s, heads, scale,
                     bounded=False):
    return _rope_fused_impl(q, k, v, cos_s, sin_s, heads, scale,
                            bounded=bounded)


def rope_fused_attention(q, k, v, cos_s, sin_s, heads, scale,
                         bounded=False):
    """Self-attention over split-RoPE-layout token-major tensors with the
    rotation fused into the kernel.  q/k: [B, L, C] in global split-half
    channel order; cos_s/sin_s: [B, L, C/2].  Shapes must satisfy
    :func:`rope_fused_supports`.  ``bounded``: qk-normed logits — skip the
    softmax max pass (see _fwd_kernel_bounded).  Batch-sharded under an
    ambient mesh (see _ambient_kernel_mesh)."""
    mesh = _ambient_kernel_mesh(q.shape[0])
    if mesh is None:
        return _rope_fused_cvjp(q, k, v, cos_s, sin_s, heads, scale, bounded)
    return _shard_batched_call(
        mesh,
        lambda q_, k_, v_, c_, s_: _rope_fused_cvjp(
            q_, k_, v_, c_, s_, heads, scale, bounded
        ),
        q, k, v, cos_s, sin_s,
    )


def _rope_fused_fwd(q, k, v, cos_s, sin_s, heads, scale, bounded=False):
    return _rope_fused_impl(q, k, v, cos_s, sin_s, heads, scale,
                            bounded=bounded), (
        q, k, v, cos_s, sin_s,
    )


def _rope_fused_bwd(heads, scale, bounded, residuals, g):
    q, k, v, cos_s, sin_s = residuals
    from avatar_tpu.ops.rope import apply_rotary_emb_split

    b, lq, c = q.shape
    hd = c // heads
    recompute = _fused_recompute_fn(q.shape, heads, None, scale)

    def to_head_major(t):
        t = t.reshape(b, lq, 2, heads, hd // 2)
        return t.transpose(0, 1, 3, 2, 4).reshape(b, lq, c)

    def ref(q_, k_, v_):
        qr = to_head_major(apply_rotary_emb_split(q_, (cos_s, sin_s)))
        kr = to_head_major(apply_rotary_emb_split(k_, (cos_s, sin_s)))
        return recompute(qr, kr, v_)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_rope_fused_cvjp.defvjp(_rope_fused_fwd, _rope_fused_bwd)


def _fused_ref(q, k, v, kv_mask, heads, scale):
    """jnp reference (and CPU backward recompute) of the token-major path."""
    from avatar_tpu.ops.attention import xla_attention

    b, lq, c = q.shape
    hd = c // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    bias = None
    if kv_mask is not None:
        bias = jnp.where(kv_mask > 0.5, 0.0, -1e30)[:, None, None, :]
    out = xla_attention(split(q), split(k), split(v), bias, scale)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, c)


def _fused_recompute_fn(q_shape, heads, kv_mask, scale, k_len=None):
    """Recompute function used inside the fused paths' backward vjp.

    On TPU backends this routes through :func:`flash_attention` (head-major),
    whose custom_vjp runs the fused Pallas backward kernels — the XLA-vjp
    recompute materializes full [B,H,L,L] f32 logits in HBM and measured
    76 ms/step (25%) of the b=8 LoRA train step at 480 tokens on v5e.
    On CPU the XLA reference stays (interpret-mode kernels are test-only)."""
    b, lq, c = q_shape
    hd = c // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    def flash_ref(q_, k_, v_, kv_mask_):
        qh, kh, vh = split(q_), split(k_), split(v_)
        out = flash_attention(qh, kh, vh, kv_mask=kv_mask_, scale=scale)
        return out.transpose(0, 2, 1, 3).reshape(b, lq, c)

    from avatar_tpu.ops.attention import tpu_backend

    # same profitability rule as supports(): MXU-friendly head dim and a
    # sequence product worth a kernel launch. lq * lk, NOT lq * lq — a
    # cross-attention backward (long q, short kv) would otherwise take the
    # kernel at sizes where XLA measured faster (ADVICE r2 item 3).
    lk = lq if k_len is None else k_len
    if tpu_backend() and hd % 8 == 0 and hd <= 512 and lq * lk >= 128 * 128:
        return lambda q_, k_, v_: flash_ref(q_, k_, v_, kv_mask)
    return lambda q_, k_, v_: _fused_ref(q_, k_, v_, kv_mask, heads, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_token_cvjp(q, k, v, kv_mask, heads, scale, bounded=False):
    return _fused_fwd_impl(q, k, v, kv_mask, heads, scale, bounded=bounded)


def fused_token_attention(q, k, v, kv_mask, heads, scale, bounded=False):
    """Attention over token-major [B, L, heads*head_dim] tensors.

    kv_mask: optional [B, Lk] keep mask.  Shapes must satisfy
    :func:`fused_supports`.  Backward recomputes via flash/XLA (see
    _fused_recompute_fn).  ``bounded``: qk-normed logits — skip the
    softmax max pass.  Batch-sharded under an ambient mesh (see
    _ambient_kernel_mesh)."""
    mesh = _ambient_kernel_mesh(q.shape[0])
    if mesh is None:
        return _fused_token_cvjp(q, k, v, kv_mask, heads, scale, bounded)
    if kv_mask is None:
        return _shard_batched_call(
            mesh,
            lambda q_, k_, v_: _fused_token_cvjp(
                q_, k_, v_, None, heads, scale, bounded
            ),
            q, k, v,
        )
    return _shard_batched_call(
        mesh,
        lambda q_, k_, v_, m_: _fused_token_cvjp(
            q_, k_, v_, m_, heads, scale, bounded
        ),
        q, k, v, kv_mask,
    )


def _fused_fwd(q, k, v, kv_mask, heads, scale, bounded=False):
    return _fused_fwd_impl(q, k, v, kv_mask, heads, scale,
                           bounded=bounded), (q, k, v, kv_mask)


def _fused_bwd(heads, scale, bounded, residuals, g):
    q, k, v, kv_mask = residuals
    recompute = _fused_recompute_fn(q.shape, heads, kv_mask, scale,
                                    k_len=k.shape[1])
    _, vjp = jax.vjp(recompute, q, k, v)
    dq, dk, dv = vjp(g)
    dmask = None if kv_mask is None else jnp.zeros_like(kv_mask)
    return dq, dk, dv, dmask


_fused_token_cvjp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    do_ref,  # [1, Bq, D]
    lse_ref,  # [1, 1, Bq]
    delta_ref,  # [1, 1, Bq]
    mask_ref,  # [1, 1, Bk] or None
    dk_ref,  # [1, Bk, D]
    dv_ref,  # [1, Bk, D]
    dk_scratch,  # [Bk, D] f32
    dv_scratch,  # [Bk, D] f32
    *,
    scale: float,
    num_q_blocks: int,
):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Bq, Bk]
    if mask_ref is not None:
        # mask BEFORE exp: a large masked logit must not overflow to inf
        s = jnp.where(mask_ref[0, 0][None, :] > 0.5, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])  # [Bq, Bk]

    p_cast = p.astype(do_ref.dtype)
    # dV += P^T dO
    dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
        p_cast, do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dS = P * (dO V^T - delta) * scale
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk]
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    # dK += dS^T Q
    dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_dkv_kernel_nomask(q, k, v, do, lse, delta, dk, dv, dks, dvs, *,
                           scale, num_q_blocks):
    _bwd_dkv_kernel(q, k, v, do, lse, delta, None, dk, dv, dks, dvs,
                    scale=scale, num_q_blocks=num_q_blocks)


def _bwd_dq_kernel(
    q_ref,  # [1, Bq, D]
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    do_ref,  # [1, Bq, D]
    lse_ref,  # [1, 1, Bq]
    delta_ref,  # [1, 1, Bq]
    mask_ref,  # [1, 1, Bk] or None
    dq_ref,  # [1, Bq, D]
    dq_scratch,  # [Bq, D] f32
    *,
    scale: float,
    num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask_ref is not None:
        s = jnp.where(mask_ref[0, 0][None, :] > 0.5, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dq_kernel_nomask(q, k, v, do, lse, delta, dq, dqs, *,
                          scale, num_kv_blocks):
    _bwd_dq_kernel(q, k, v, do, lse, delta, None, dq, dqs,
                   scale=scale, num_kv_blocks=num_kv_blocks)


def _flash_backward(q, k, v, kv_mask, out, lse, g, scale, block_q, block_kv):
    batch, heads, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, DEFAULT_BWD_BLOCK)
    block_kv = min(block_kv, DEFAULT_BWD_BLOCK)
    qp, kp, vp, maskp, block_q, block_kv, lq_pad, lk_pad = _pad_inputs(
        q, k, v, kv_mask, block_q, block_kv
    )
    bh = batch * heads
    do = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))).reshape(
        bh, lq_pad, d
    )
    # delta = rowsum(dO * O), padded rows contribute 0 (dO is zero there)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, H, Lq]
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq))).reshape(
        bh, 1, lq_pad
    )
    # lse comes already padded from the forward: [bh, 1, lq_pad_fwd].
    if lse.shape[-1] != lq_pad:
        lse = jnp.pad(
            lse[:, :, :min(lse.shape[-1], lq_pad)],
            ((0, 0), (0, 0), (0, max(0, lq_pad - lse.shape[-1]))),
            constant_values=LSE_MASKED,
        )

    num_q_blocks = lq_pad // block_q
    num_kv_blocks = lk_pad // block_kv
    interpret = _interpret()

    q_spec_byq = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)
    kv_spec_byj = pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                               memory_space=pltpu.VMEM)
    row_spec_byq = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                                memory_space=pltpu.VMEM)
    mask_spec_byj = pl.BlockSpec(
        (1, 1, block_kv), lambda b, i, j, h=heads: (b // h, 0, j),
        memory_space=pltpu.VMEM,
    )

    # -- dK/dV: grid (bh, kv blocks, q blocks), q innermost --
    q_spec_inner = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    kv_spec_outer = pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                                 memory_space=pltpu.VMEM)
    row_spec_inner = pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                                  memory_space=pltpu.VMEM)
    mask_spec_outer = pl.BlockSpec(
        (1, 1, block_kv), lambda b, j, i, h=heads: (b // h, 0, j),
        memory_space=pltpu.VMEM,
    )
    dkv_in_specs = [q_spec_inner, kv_spec_outer, kv_spec_outer, q_spec_inner,
                    row_spec_inner, row_spec_inner]
    dkv_args = [qp, kp, vp, do, lse, delta]
    if maskp is not None:
        dkv_in_specs.append(mask_spec_outer)
        dkv_args.append(maskp[:, None, :])
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, scale=scale, num_q_blocks=num_q_blocks
        )
    else:
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel_nomask, scale=scale, num_q_blocks=num_q_blocks
        )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        interpret=interpret,
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=dkv_in_specs,
        out_specs=(kv_spec_outer, kv_spec_outer),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*dkv_args)

    # -- dQ: grid (bh, q blocks, kv blocks), kv innermost --
    dq_in_specs = [q_spec_byq, kv_spec_byj, kv_spec_byj, q_spec_byq,
                   row_spec_byq, row_spec_byq]
    dq_args = [qp, kp, vp, do, lse, delta]
    if maskp is not None:
        dq_in_specs.append(mask_spec_byj)
        dq_args.append(maskp[:, None, :])
        dq_kernel = functools.partial(
            _bwd_dq_kernel, scale=scale, num_kv_blocks=num_kv_blocks
        )
    else:
        dq_kernel = functools.partial(
            _bwd_dq_kernel_nomask, scale=scale, num_kv_blocks=num_kv_blocks
        )
    dq = pl.pallas_call(
        dq_kernel,
        interpret=interpret,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=dq_in_specs,
        out_specs=q_spec_byq,
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*dq_args)

    dq = dq.reshape(batch, heads, lq_pad, d)[:, :, :lq]
    dk = dk.reshape(batch, heads, lk_pad, d)[:, :, :lk]
    dv = dv.reshape(batch, heads, lk_pad, d)[:, :, :lk]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, kv_mask, scale, block_q, block_kv, bounded=False):
    return _flash_forward(q, k, v, kv_mask, scale, block_q, block_kv,
                          bounded=bounded)


def _flash_fwd(q, k, v, kv_mask, scale, block_q, block_kv, bounded=False):
    out, lse = _flash_forward(
        q, k, v, kv_mask, scale, block_q, block_kv, with_lse=True,
        bounded=bounded,
    )
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd(scale, block_q, block_kv, bounded, residuals, g):
    q, k, v, kv_mask, out, lse = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, kv_mask, out, lse, g, scale, block_q, block_kv
    )
    dmask = None if kv_mask is None else jnp.zeros_like(kv_mask)
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Dense-bias path (general [B, 1|H, Lq, Lk] additive bias)
# ---------------------------------------------------------------------------


def _flash_dense_forward(q, k, v, bias, scale, block_q, block_kv,
                         return_lse=False):
    """Blocked forward with a dense additive bias.  bias: [Bb, Lq, Lk]
    where Bb is B (shared across heads) or B*H (per-head)."""
    batch, heads, lq, d = q.shape
    qp, kp, vp, _, block_q, block_kv, lq_pad, lk_pad = _pad_inputs(
        q, k, v, None, block_q, block_kv
    )
    bh = batch * heads
    lk = k.shape[2]
    # pad: q rows with 0 (sliced off at the end), kv columns with NEG_INF
    # so padded keys are fully masked for every real row
    bias = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, lq_pad - lq), (0, lk_pad - lk)),
        constant_values=NEG_INF,
    )
    per_head = bias.shape[0] == bh

    num_q_blocks = lq_pad // block_q
    num_kv_blocks = lk_pad // block_kv
    grid = (bh, num_q_blocks, num_kv_blocks)
    if per_head:
        bias_index = lambda b, qi, ki: (b, qi, ki)  # noqa: E731
    else:
        bias_index = lambda b, qi, ki, h=heads: (b // h, qi, ki)  # noqa: E731

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_dense_bias, scale=scale,
                          num_kv_blocks=num_kv_blocks),
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, qi, ki: (b, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_kv), bias_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, bias)
    out = out[:, :lq].reshape(batch, heads, lq, d)
    if return_lse:
        return out, lse
    del lse
    return out


def _bwd_dkv_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         bias_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                         *, scale, num_q_blocks):
    """dK/dV with a dense additive bias: identical to _bwd_dkv_kernel but
    the probabilities are regenerated as exp(qk*scale + bias - lse) —
    bias block [1, Bq, Bk] (rows = q of this inner step, cols = kv)."""
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]  # [Bq, Bk]
    p = jnp.exp(s - lse_ref[0, 0][:, None])

    dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_dq_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        bias_ref, dq_ref, dq_scratch,
                        *, scale, num_kv_blocks):
    """dQ with a dense additive bias (see _bwd_dq_kernel)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, None]) * scale
    dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_db_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   bias_ref, db_ref, db_scratch, *, scale, heads_group):
    """dBias = sum over the heads sharing one bias slab of P*(dP - delta).

    Grid (Bb, q blocks, kv blocks, heads_group), heads innermost — the
    output block index is constant across the h sweep, so accumulating in
    scratch and flushing at h == heads_group-1 is the legal
    consecutive-revisit pattern (per-head bias: heads_group == 1)."""
    hh = pl.program_id(3)

    @pl.when(hh == 0)
    def _init():
        db_scratch[:] = jnp.zeros_like(db_scratch)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_scratch[:] = db_scratch[:] + p * (dp - delta_ref[0, 0][:, None])

    @pl.when(hh == heads_group - 1)
    def _finalize():
        db_ref[0] = db_scratch[:].astype(db_ref.dtype)


def _flash_dense_backward(q, k, v, bias, out, lse, g, scale, block_q,
                          block_kv):
    """Pallas backward for the dense-bias path (VERDICT r3 item 9 — was an
    XLA recompute materializing the [B*H, Lq, Lk] logits). Three streaming
    passes (dK/dV, dQ, dBias) that regenerate P blockwise from the saved
    lse, like _flash_backward; db never materializes per-head slabs even
    when the bias is shared across heads."""
    batch, heads, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, DEFAULT_BWD_BLOCK)
    block_kv = min(block_kv, DEFAULT_BWD_BLOCK)
    qp, kp, vp, _, block_q, block_kv, lq_pad, lk_pad = _pad_inputs(
        q, k, v, None, block_q, block_kv
    )
    bh = batch * heads
    bb = bias.shape[0]
    heads_group = bh // bb
    biasp = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, lq_pad - lq), (0, lk_pad - lk)),
        constant_values=NEG_INF,
    )
    do = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))).reshape(
        bh, lq_pad, d
    )
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lq_pad - lq))).reshape(
        bh, 1, lq_pad
    )
    if lse.shape[-1] != lq_pad:
        lse = jnp.pad(
            lse[:, :, :min(lse.shape[-1], lq_pad)],
            ((0, 0), (0, 0), (0, max(0, lq_pad - lse.shape[-1]))),
            constant_values=LSE_MASKED,
        )

    num_q_blocks = lq_pad // block_q
    num_kv_blocks = lk_pad // block_kv
    interpret = _interpret()
    hg = heads_group

    # -- dK/dV: grid (bh, kv blocks, q blocks), q innermost --
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_bias, scale=scale,
                          num_q_blocks=num_q_blocks),
        interpret=interpret,
        grid=(bh, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_kv),
                         lambda b, j, i, h=hg: (b // h, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, do, lse, delta, biasp)

    # -- dQ: grid (bh, q blocks, kv blocks), kv innermost --
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_bias, scale=scale,
                          num_kv_blocks=num_kv_blocks),
        interpret=interpret,
        grid=(bh, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_kv),
                         lambda b, i, j, h=hg: (b // h, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, do, lse, delta, biasp)

    # -- dBias: grid (Bb, q blocks, kv blocks, heads_group), h innermost --
    db = pl.pallas_call(
        functools.partial(_bwd_db_kernel, scale=scale,
                          heads_group=heads_group),
        interpret=interpret,
        grid=(bb, num_q_blocks, num_kv_blocks, heads_group),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda b, i, j, hh, h=hg: (b * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d),
                         lambda b, i, j, hh, h=hg: (b * h + hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d),
                         lambda b, i, j, hh, h=hg: (b * h + hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d),
                         lambda b, i, j, hh, h=hg: (b * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda b, i, j, hh, h=hg: (b * h + hh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda b, i, j, hh, h=hg: (b * h + hh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_kv),
                         lambda b, i, j, hh: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, block_kv),
                               lambda b, i, j, hh: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bb, lq_pad, lk_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, block_kv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp, do, lse, delta, biasp)

    dq = dq.reshape(batch, heads, lq_pad, d)[:, :, :lq]
    dk = dk.reshape(batch, heads, lk_pad, d)[:, :, :lk]
    dv = dv.reshape(batch, heads, lk_pad, d)[:, :, :lk]
    db = db[:, :lq, :lk].astype(bias.dtype)
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_dense(q, k, v, bias, scale, block_q, block_kv):
    return _flash_dense_forward(q, k, v, bias, scale, block_q, block_kv)


def _flash_dense_fwd(q, k, v, bias, scale, block_q, block_kv):
    out, lse = _flash_dense_forward(q, k, v, bias, scale, block_q, block_kv,
                                    return_lse=True)
    return out, (q, k, v, bias, out, lse)


def _flash_dense_bwd(scale, block_q, block_kv, residuals, g):
    q, k, v, bias, out, lse = residuals
    return _flash_dense_backward(q, k, v, bias, out, lse, g, scale,
                                 block_q, block_kv)


_flash_dense.defvjp(_flash_dense_fwd, _flash_dense_bwd)


def dense_bias_supported(q, k, bias) -> bool:
    """Whether the dense-bias Pallas kernel handles this (q, k, bias)."""
    if bias.ndim != 4 or q.ndim != 4:
        return False
    b, h, lq, d = q.shape
    lk = k.shape[2]
    return (
        bias.shape[0] == b
        and bias.shape[1] in (1, h)
        and bias.shape[2] == lq
        and bias.shape[3] == lk
        and d % 8 == 0
        and d <= 512
        and lq * lk >= 128 * 128
    )


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Flash attention over [B, H, L, D].

    Accepts either a [B, Lkv] keep-mask (`kv_mask`) or a broadcastable
    additive `bias`; a general dense bias falls back to the XLA path.

    ``bounded_logits``: the caller guarantees |logits| stays far below the
    f32 exp limit (true after rms qk-norm) — selects the max-free online
    softmax kernel (~1.8x fwd at L=5376 on v5e, see _fwd_kernel_bounded).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bias is not None and kv_mask is None:
        # Per-kv-position biases become a keep mask (fast path); a general
        # dense bias takes the dense-bias kernel when shapes allow, with
        # XLA as the last resort (e.g. broadcast-incompatible layouts).
        squeezed = bias
        if squeezed.ndim == 4 and squeezed.shape[1] == 1 and squeezed.shape[2] == 1:
            kv_mask = (squeezed[:, 0, 0, :] >= -1.0).astype(jnp.float32)
            bias = None
        elif dense_bias_supported(q, k, bias):
            b, h, lq, _ = q.shape
            lk = k.shape[2]
            bias3 = (
                bias[:, 0] if bias.shape[1] == 1
                else bias.reshape(b * h, lq, lk)
            )
            scale_f = float(scale)
            bq, bkv = int(block_q), int(block_kv)
            mesh = _ambient_kernel_mesh(b)
            if mesh is None:
                return _flash_dense(q, k, v, bias3, scale_f, bq, bkv)
            return _shard_batched_call(
                mesh,
                lambda q_, k_, v_, b_: _flash_dense(q_, k_, v_, b_,
                                                    scale_f, bq, bkv),
                q, k, v, bias3,
            )
        else:
            from avatar_tpu.ops.attention import xla_attention

            return xla_attention(q, k, v, bias, scale)
    scale, block_q, block_kv = float(scale), int(block_q), int(block_kv)
    bounded_logits = bool(bounded_logits)
    mesh = _ambient_kernel_mesh(q.shape[0])
    if mesh is None:
        return _flash(q, k, v, kv_mask, scale, block_q, block_kv,
                      bounded_logits)
    if kv_mask is None:
        return _shard_batched_call(
            mesh,
            lambda q_, k_, v_: _flash(q_, k_, v_, None, scale, block_q,
                                      block_kv, bounded_logits),
            q, k, v,
        )
    return _shard_batched_call(
        mesh,
        lambda q_, k_, v_, m_: _flash(q_, k_, v_, m_, scale, block_q,
                                      block_kv, bounded_logits),
        q, k, v, kv_mask,
    )
