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
) -> jnp.ndarray:
    """Sequence-parallel ``dit_apply``: the full 28-block DiT under
    ``shard_map`` with token-sharded activations.

    Everything except self-attention is embarrassingly token-parallel
    (projections, norms, AdaLN modulation, the MLP); self-attention becomes
    Ulysses all-to-all (heads<->tokens re-shard, two collectives per block
    over ICI) and cross-attention attends local queries against the
    replicated text kv with no communication.  This is the long-context
    machinery the reference lacks entirely (SURVEY §5): the 512px/161-frame
    BASELINE config's ~10k-token sequences shard across a v5p slice.

    Requires N % sp_size == 0 and num_heads % sp_size == 0.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from avatar_tpu.models.dit import dit_apply

    s = mesh.shape[axis]
    n = hidden_states.shape[1]
    assert n % s == 0, f"tokens {n} not divisible by sp={s}"
    assert cfg.num_attention_heads % s == 0, (cfg.num_attention_heads, s)

    tok = P(None, axis, None)
    rep = P()

    args = (
        params, hidden_states, indices_grid, timestep,
        encoder_hidden_states, encoder_attention_mask,
        skip_layer_mask, freqs_cis, cross_kv, lora,
    )
    t_spec = rep if timestep.ndim == 1 else P(None, axis)
    specs = (
        rep,                    # params (replicated)
        tok,                    # hidden_states
        P(None, None, axis),    # indices_grid
        t_spec,                 # timestep
        rep,                    # encoder_hidden_states
        rep,                    # encoder_attention_mask
        rep,                    # skip_layer_mask
        tok,                    # freqs_cis (cos, sin) [B, N, dim]
        rep,                    # cross_kv
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
            sp_axis=axis,
        )

    return inner(*args)
