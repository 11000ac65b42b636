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
