"""Sequence (context) parallelism: Ulysses-style sharded attention.

The reference has no long-sequence machinery at all (SURVEY §5: "no ring
attention, no Ulysses, no context parallel"); its v5p-64 512px·161-frame
target (BASELINE config 5) needs the token axis sharded across chips. This
module provides DeepSpeed-Ulysses-style attention under ``shard_map``:

  activations are sharded on the token axis ('sp');
  for attention, an all-to-all re-shards heads<->tokens so every device
  holds ALL tokens for H/s heads, runs the local flash kernel, and an
  inverse all-to-all restores token sharding.

Two all-to-alls per attention ride the ICI; everything outside attention
(norms, MLPs, modulation) is embarrassingly token-parallel and needs no
communication.

Usage (see tests/test_sequence_parallel.py):

    mesh = make_mesh(...)  # with an axis used for sequence parallelism
    @partial(shard_map, mesh=mesh, in_specs=P(None, None, 'sp', None), ...)
    def attn(q, k, v):
        return ulysses_attention(q, k, v, axis_name='sp')
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def ulysses_attention(
    q: jnp.ndarray,  # [B, H, N/s, D] — local token shard, all heads
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Nkv/s] local keep-mask shard
    scale: Optional[float] = None,
    attention_impl: str = "auto",
) -> jnp.ndarray:
    """Sequence-sharded attention inside ``shard_map``.

    Requires num_heads % axis_size == 0. Returns the local token shard of
    the attention output, [B, H, N/s, D].
    """
    from avatar_tpu.ops.attention import scaled_dot_product_attention

    s = jax.lax.axis_size(axis_name)
    b, h, n_local, d = q.shape
    assert h % s == 0, f"heads {h} not divisible by sp axis {s}"

    def seq_to_heads(x):
        # [B, H, N/s, D] -> [B, H/s, N, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    def heads_to_seq(x):
        # [B, H/s, N, D] -> [B, H, N/s, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    q_full = seq_to_heads(q)
    k_full = seq_to_heads(k)
    v_full = seq_to_heads(v)

    mask_full = None
    if kv_mask is not None:
        # gather the full kv keep-mask (tiny: [B, Nkv])
        mask_full = jax.lax.all_gather(
            kv_mask, axis_name, axis=1, tiled=True
        )

    out = scaled_dot_product_attention(
        q_full, k_full, v_full, mask=mask_full, scale=scale,
        impl=attention_impl,
    )
    return heads_to_seq(out)


def ring_attention(
    q: jnp.ndarray,  # [B, H, N/s, D] — local token shard, all heads
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, N/s] local keep-mask shard
    scale: Optional[float] = None,
    bounded_logits: bool = False,
    chunk_impl: str = "auto",  # "dense" | "flash" | "auto"
) -> jnp.ndarray:
    """Ring (context-parallel) attention inside ``shard_map``.

    Unlike :func:`ulysses_attention` there is NO ``heads % axis_size``
    constraint, so the sequence can shard past the head count (the 2B DiT
    has 32 heads; a v5p-64 slice has 64 chips): queries stay put while the
    k/v (and kv-mask) shards rotate around the ring via ``ppermute``, and
    an online softmax merges each chunk's contribution.  s-1 hops of the
    local kv shard ride the ICI ring, overlapping with each chunk's
    matmuls under XLA's latency-hiding scheduler.  Communication volume
    per device is the same as Ulysses' two all-to-alls, but every transfer
    is a nearest-neighbour hop instead of an all-to-all, so it also maps
    onto meshes whose 'sp' axis is a plain ring.

    With ``bounded_logits`` (rms qk-norm upstream bounds |logit| <= ~8),
    the running max and the accumulator rescale are dropped entirely —
    chunk contributions become pure adds, the same max-free trick the
    Pallas flash kernels use (upper clamp at 80 as a safety net).

    Fully-masked rows degrade to uniform attention, matching the dense
    oracle's ``-1e30`` additive-bias convention (ops/attention.py).

    ``chunk_impl`` selects the per-chunk attention: ``"dense"`` is XLA
    einsum (full [n_local, m_local] f32 logits — fine for short local
    shards), ``"flash"`` runs the Pallas blocked flash kernels per chunk
    with a log-sum-exp merge (:func:`ring_flash_attention`), ``"auto"``
    picks flash whenever the local shapes clear the kernels' profitability
    rule.  Note the flash path keeps the kernels' fully-masked-row
    convention (0 output) rather than the dense uniform degrade.
    """
    s = jax.lax.axis_size(axis_name)
    b, h, n_local, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if chunk_impl != "dense":
        from avatar_tpu.ops.flash_attention import supports

        if chunk_impl == "flash" or supports(q, k, v):
            return ring_flash_attention(
                q, k, v, axis_name=axis_name, kv_mask=kv_mask, scale=scale,
                bounded_logits=bounded_logits,
            )
    # send my kv chunk to the next device around the ring
    perm = [(i, (i + 1) % s) for i in range(s)]
    qf = q.astype(jnp.float32) * scale
    neg = jnp.float32(-1e30)

    def logits_of(k_c, m_c):
        lg = jnp.einsum("bhnd,bhmd->bhnm", qf, k_c.astype(jnp.float32))
        if m_c is not None:
            lg = jnp.where(m_c[:, None, None, :] > 0.5, lg, neg)
        return lg

    def rotate(k_c, v_c, m_c):
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        m_n = (
            None if m_c is None else jax.lax.ppermute(m_c, axis_name, perm)
        )
        return k_n, v_n, m_n

    # scan carries must carry the same varying-manual-axes type ('sp') as
    # the per-step outputs they merge with under shard_map
    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    num0 = vary(jnp.zeros((b, h, n_local, d), jnp.float32))
    den0 = vary(jnp.zeros((b, h, n_local), jnp.float32))

    if bounded_logits:
        # masked entries get exp(-1e30) == 0 exactly, so fully-masked rows
        # end the ring with num == den == 0; carry a v-sum so those rows can
        # degrade to uniform attention over ALL kv, matching the unbounded
        # branch (where p == 1 everywhere once every logit is the sentinel)
        vsum0 = vary(jnp.zeros((b, h, d), jnp.float32))

        def step(carry, _):
            k_c, v_c, m_c, num, den, vsum = carry
            p = jnp.exp(jnp.minimum(logits_of(k_c, m_c), 80.0))
            num = num + jnp.einsum(
                "bhnm,bhmd->bhnd", p, v_c.astype(jnp.float32)
            )
            den = den + p.sum(-1)
            vsum = vsum + v_c.astype(jnp.float32).sum(2)
            k_c, v_c, m_c = rotate(k_c, v_c, m_c)
            return (k_c, v_c, m_c, num, den, vsum), None

        (_, _, _, num, den, vsum), _ = jax.lax.scan(
            step, (k, v, kv_mask, num0, den0, vsum0), None, length=s
        )
        dead = den == 0.0
        num = jnp.where(
            dead[..., None], vsum[:, :, None, :] / (s * k.shape[2]), num
        )
        den = jnp.where(dead, 1.0, den)
    else:
        # online softmax with a running row max; -1e30 (finite) sentinels
        # keep the max/rescale arithmetic nan-free for masked chunks
        m0 = vary(jnp.full((b, h, n_local), neg, jnp.float32))

        def step(carry, _):
            k_c, v_c, m_c, m_run, num, den = carry
            lg = logits_of(k_c, m_c)
            m_new = jnp.maximum(m_run, lg.max(-1))
            alpha = jnp.exp(m_run - m_new)
            p = jnp.exp(lg - m_new[..., None])
            num = num * alpha[..., None] + jnp.einsum(
                "bhnm,bhmd->bhnd", p, v_c.astype(jnp.float32)
            )
            den = den * alpha + p.sum(-1)
            k_c, v_c, m_c = rotate(k_c, v_c, m_c)
            return (k_c, v_c, m_c, m_new, num, den), None

        (_, _, _, _, num, den), _ = jax.lax.scan(
            step, (k, v, kv_mask, m0, num0, den0), None, length=s
        )

    return (num / den[..., None]).astype(q.dtype)


def ring_flash_attention(
    q: jnp.ndarray,  # [B, H, N/s, D] — local token shard, all heads
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    bounded_logits: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
) -> jnp.ndarray:
    """Ring attention with Pallas flash kernels per chunk.

    The dense ring path materializes full [n_local, m_local] f32 logits per
    hop — at the 512px·161f shapes (5376-token global sequence) that is the
    same XLA softmax HBM round-trip the single-chip flash kernels were
    built to kill.  Here each hop runs the blocked flash forward on
    (q_local, kv_chunk) and merges chunks by log-sum-exp:

        out = sum_c out_c * exp(lse_c - lse)  with  lse = logsumexp_c lse_c

    so VMEM-blocked attention + per-row lse is all that ever touches HBM.
    The backward is a second ring pass: the kv chunk rotates together with
    its dk/dv accumulator (each device adds its Pallas dq/dkv-kernel
    contribution as the chunk passes through), arriving home complete after
    s hops; dq accumulates locally.  Per-chunk lse comes from the global
    merged value, so each chunk's recomputed p = exp(s - lse) is its exact
    share of the global softmax.

    Keeps the flash kernels' fully-masked-row convention: 0 output (the
    forward neutralizes per-chunk LSE_MASKED sentinels in the merge and the
    backward restores them so masked rows produce zero gradient).
    """
    from avatar_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_KV,
        DEFAULT_BLOCK_Q,
    )

    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _ring_flash(
        q, k, v, kv_mask, axis_name, float(scale), bool(bounded_logits),
        int(block_q or DEFAULT_BLOCK_Q), int(block_kv or DEFAULT_BLOCK_KV),
    )


def _ring_flash_forward(q, k, v, kv_mask, axis_name, scale, bounded,
                        block_q, block_kv):
    from avatar_tpu.ops.flash_attention import LSE_MASKED, _flash_forward

    s = jax.lax.axis_size(axis_name)
    b, h, n, _ = q.shape
    perm = [(i, (i + 1) % s) for i in range(s)]
    neg = jnp.float32(-1e30)
    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    acc0 = vary(jnp.zeros(q.shape, jnp.float32))
    lse0 = vary(jnp.full((b, h, n), neg, jnp.float32))

    def step(carry, _):
        k_c, v_c, m_c, acc, lse_run = carry
        o_c, lse_pad = _flash_forward(
            q, k_c, v_c, m_c, scale, block_q, block_kv,
            with_lse=True, bounded=bounded,
        )
        lse_c = lse_pad.reshape(b, h, -1)[:, :, :n]
        # fully-masked chunk rows carry the +LSE_MASKED sentinel — excise
        # them from the merge (finite -1e30 keeps logaddexp NaN-free)
        lse_c = jnp.where(lse_c >= 0.5 * LSE_MASKED, neg, lse_c)
        lse_new = jnp.logaddexp(lse_run, lse_c)
        acc = (
            acc * jnp.exp(lse_run - lse_new)[..., None]
            + o_c.astype(jnp.float32) * jnp.exp(lse_c - lse_new)[..., None]
        )
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        if m_c is not None:
            m_c = jax.lax.ppermute(m_c, axis_name, perm)
        return (k_c, v_c, m_c, acc, lse_new), None

    (_, _, _, acc, lse), _ = jax.lax.scan(
        step, (k, v, kv_mask, acc0, lse0), None, length=s
    )
    return acc.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_flash(q, k, v, kv_mask, axis_name, scale, bounded,
                block_q, block_kv):
    out, _ = _ring_flash_forward(q, k, v, kv_mask, axis_name, scale,
                                 bounded, block_q, block_kv)
    return out


def _ring_flash_fwd(q, k, v, kv_mask, axis_name, scale, bounded,
                    block_q, block_kv):
    out, lse = _ring_flash_forward(q, k, v, kv_mask, axis_name, scale,
                                   bounded, block_q, block_kv)
    return out, (q, k, v, kv_mask, out, lse)


def _ring_flash_bwd(axis_name, scale, bounded, block_q, block_kv,
                    residuals, g):
    from avatar_tpu.ops.flash_attention import LSE_MASKED, _flash_backward

    q, k, v, kv_mask, out, lse = residuals
    s = jax.lax.axis_size(axis_name)
    b, h, n, _ = q.shape
    perm = [(i, (i + 1) % s) for i in range(s)]
    # globally-masked rows: restore the +LSE_MASKED sentinel so the
    # backward kernels' p = exp(s - lse) is exactly 0 there
    lse3 = jnp.where(
        lse <= -0.5 * LSE_MASKED, jnp.float32(LSE_MASKED), lse
    ).reshape(b * h, 1, n)
    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    dq0 = vary(jnp.zeros(q.shape, jnp.float32))
    dk0 = vary(jnp.zeros(k.shape, jnp.float32))
    dv0 = vary(jnp.zeros(v.shape, jnp.float32))

    def step(carry, _):
        k_c, v_c, m_c, dq_acc, dk_acc, dv_acc = carry
        dq_c, dk_c, dv_c = _flash_backward(
            q, k_c, v_c, m_c, out, lse3, g, scale, block_q, block_kv
        )
        dq_acc = dq_acc + dq_c.astype(jnp.float32)
        dk_acc = dk_acc + dk_c.astype(jnp.float32)
        dv_acc = dv_acc + dv_c.astype(jnp.float32)
        # the dk/dv accumulators travel WITH their kv chunk: after s hops
        # the chunk is home and its gradient holds every device's term
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        dk_acc = jax.lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = jax.lax.ppermute(dv_acc, axis_name, perm)
        if m_c is not None:
            m_c = jax.lax.ppermute(m_c, axis_name, perm)
        return (k_c, v_c, m_c, dq_acc, dk_acc, dv_acc), None

    (_, _, _, dq, dk, dv), _ = jax.lax.scan(
        step, (k, v, kv_mask, dq0, dk0, dv0), None, length=s
    )
    dmask = None if kv_mask is None else jnp.zeros_like(kv_mask)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmask)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ulysses_cross_attention(
    q: jnp.ndarray,  # [B, H, Nq/s, D] token-sharded queries
    k: jnp.ndarray,  # [B, H, Lkv, D] REPLICATED kv (e.g. 256 text tokens)
    v: jnp.ndarray,
    axis_name: str,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lkv] replicated
    scale: Optional[float] = None,
    attention_impl: str = "auto",
) -> jnp.ndarray:
    """Cross-attention with replicated (short) kv needs NO communication:
    each shard attends its own queries against the full kv."""
    from avatar_tpu.ops.attention import scaled_dot_product_attention

    return scaled_dot_product_attention(
        q, k, v, mask=kv_mask, scale=scale, impl=attention_impl
    )


def dit_apply_sp(
    params: dict,
    cfg,
    hidden_states: jnp.ndarray,  # [B, N, C] tokens (N % sp == 0)
    indices_grid: jnp.ndarray,  # [B, 3, N]
    timestep: jnp.ndarray,  # [B] or [B, N]
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    *,
    mesh,
    axis: str = "sp",
    skip_layer_mask: Optional[jnp.ndarray] = None,
    skip_layer_strategy=None,
    attention_impl: str = "auto",
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
    remat: bool = False,
    freqs_cis=None,
    rope_split: bool = False,
    cross_kv=None,
    sp_impl: str = "ulysses",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-parallel ``dit_apply``: the full 28-block DiT under
    ``shard_map`` with token-sharded activations.

    Everything except self-attention is embarrassingly token-parallel
    (projections, norms, AdaLN modulation, the MLP); self-attention becomes
    Ulysses all-to-all (heads<->tokens re-shard, two collectives per block
    over ICI) or — with ``sp_impl="ring"`` — ring attention (kv shards
    rotate via ppermute, online-softmax merge), and cross-attention attends
    local queries against the replicated text kv with no communication.
    This is the long-context machinery the reference lacks entirely
    (SURVEY §5): the 512px/161-frame BASELINE config's ~10k-token sequences
    shard across a v5p slice.

    Requires N % sp_size == 0; Ulysses additionally requires
    num_heads % sp_size == 0 (ring has no head constraint, so it covers
    meshes wider than the head count).

    ``data_axis``: optional second mesh axis to shard the BATCH dimension
    over (dp x sp composition for training: each ('data' row, 'sp' ring)
    holds one batch shard's token shard; B % data_size == 0).  All batched
    inputs (tokens, grid, timestep, text embeds/mask, skip masks, cross_kv)
    shard their leading axis over it; params/lora stay replicated, so the
    loss gradient psums over both axes automatically.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from avatar_tpu.models.dit import dit_apply

    s = mesh.shape[axis]
    n = hidden_states.shape[1]
    assert n % s == 0, f"tokens {n} not divisible by sp={s}"
    if sp_impl == "ulysses":
        assert cfg.num_attention_heads % s == 0, (
            cfg.num_attention_heads, s,
            "heads not divisible by sp axis — use sp_impl='ring'",
        )

    da = data_axis
    if da is not None:
        assert hidden_states.shape[0] % mesh.shape[da] == 0, (
            hidden_states.shape[0], mesh.shape[da],
            "batch not divisible by the data axis",
        )
    tok = P(da, axis, None)
    rep = P()

    args = (
        params, hidden_states, indices_grid, timestep,
        encoder_hidden_states, encoder_attention_mask,
        skip_layer_mask, freqs_cis, cross_kv, lora,
    )
    t_spec = P(da) if timestep.ndim == 1 else P(da, axis)
    specs = (
        rep,                    # params (replicated)
        tok,                    # hidden_states
        P(da, None, axis),      # indices_grid
        t_spec,                 # timestep
        P(da),                  # encoder_hidden_states [B, Lk, C]
        P(da),                  # encoder_attention_mask [B, Lk]
        P(None, da),            # skip_layer_mask [L, B]
        tok,                    # freqs_cis (cos, sin) [B, N, dim]
        P(da),                  # cross_kv per-block (k, v) of [B, H, Lk, D]
        rep,                    # lora
    )

    @partial(
        shard_map, mesh=mesh, in_specs=specs, out_specs=tok, check_vma=False
    )
    def inner(params, hs, grid, t, eh, eam, slm, fc, ckv, lr):
        return dit_apply(
            params, cfg, hs, grid, t, eh, eam,
            skip_layer_mask=slm, skip_layer_strategy=skip_layer_strategy,
            attention_impl=attention_impl, lora=lr, lora_scale=lora_scale,
            remat=remat, freqs_cis=fc, rope_split=rope_split, cross_kv=ckv,
            sp_axis=axis, sp_impl=sp_impl,
        )

    return inner(*args)
