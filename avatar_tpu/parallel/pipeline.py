"""Pipeline parallelism: GPipe-style stage-sharded DiT over a 'pp' mesh axis.

The reference has no pipeline parallelism (SURVEY §2.11: "PP — none"; its
only scale-out is DeepSpeed ZeRO, `training_deepspeed.py:90-94`).  This is a
new TPU-native capability for DiT variants that outgrow one chip's HBM in
depth: the transformer blocks are stacked into a single leading-`L` pytree,
sharded over the 'pp' mesh axis (each stage holds L/S contiguous blocks),
and microbatches stream through the stages under ``shard_map``:

  tick t: every stage applies its local blocks (a ``lax.scan`` over them)
  to its current activation, then a ``lax.ppermute`` hands the result to
  the next stage.  Stage i processes microbatch (t - i); after M + S - 1
  ticks all M microbatches have drained.  The bubble fraction is the usual
  (S-1)/(M+S-1).

Everything outside the blocks (token projection, RoPE tables, AdaLN
embedding, caption projection, output head) is tiny and runs replicated
outside the ``shard_map``.  Activations ride the ICI via ppermute; no other
communication exists.  Composes with data parallelism: batch dims inside a
microbatch shard over a 'data' axis.

The whole schedule is differentiable (scan + ppermute transpose), so the
same function serves pipeline-parallel training — see
tests/test_pipeline_parallel.py for forward and gradient bit-match vs the
unsharded :func:`avatar_tpu.models.dit.dit_apply`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(blocks: list) -> dict:
    """List of per-block param dicts (homogeneous structure) -> one pytree
    whose leaves carry a leading block axis [L, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked: dict) -> list:
    """Inverse of :func:`stack_block_params`."""
    num = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(num)]


def make_pp_mesh(pp: int, data: int = 1, devices=None) -> Mesh:
    """A ('data', 'pp') mesh. Adjacent pipeline stages are adjacent devices
    so ppermute hops ride one ICI link."""
    devices = list(devices if devices is not None else jax.devices())
    assert data * pp == len(devices), (data, pp, len(devices))
    return Mesh(np.asarray(devices).reshape(data, pp), ("data", "pp"))


def pp_param_sharding(mesh: Mesh, params: dict, axis: str = "pp"):
    """Sharding pytree for a DiT param tree whose "blocks" entry is stacked
    (:func:`stack_block_params`): block leaves shard their leading (block)
    axis over ``axis``; everything else is replicated."""
    assert not isinstance(params["blocks"], list), (
        "stack params['blocks'] with stack_block_params first"
    )
    rep = NamedSharding(mesh, P())

    def block_spec(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))

    out = {k: jax.tree.map(lambda _: rep, v) for k, v in params.items()}
    out["blocks"] = jax.tree.map(block_spec, params["blocks"])
    return out


def dit_apply_pp(
    params: dict,  # dit params with params["blocks"] STACKED [L, ...]
    cfg,
    hidden_states: jnp.ndarray,  # [B, N, in_channels]
    indices_grid: jnp.ndarray,  # [B, 3, N]
    timestep: jnp.ndarray,  # [B] or [B, N]
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    axis: str = "pp",
    data_axis: Optional[str] = None,
    attention_impl: str = "auto",
    lora: Optional[dict] = None,  # lora["blocks"] STACKED [L, ...] if given
    lora_scale: float = 1.0,
    remat=False,
    freqs_cis=None,
    rope_split: bool = False,
    skip_layer_mask: Optional[jnp.ndarray] = None,  # [num_layers, B]
    skip_layer_strategy=None,
    cross_kv=None,  # per-block [(k, v), ...] or stacked (k[L,...], v[L,...])
) -> jnp.ndarray:
    """Pipeline-parallel ``dit_apply``: blocks stage-sharded over ``axis``,
    microbatches streamed GPipe-style.  Returns [B, N, out_channels],
    replicated over 'pp' (batch stays sharded over ``data_axis`` if given).

    Requirements: cfg.num_layers % pp == 0, B % num_microbatches == 0 (and
    the per-microbatch batch divisible by the data axis).

    STG ``skip_layer_mask`` ([num_layers, B], reference
    transformer3d.py:187-219) and hoisted ``cross_kv`` (per-block (k, v)
    from :func:`~avatar_tpu.models.dit.precompute_cross_attention_kv`)
    ride the same stage sharding as the blocks: their leading layer axis
    shards over ``axis`` and the batch axis is microbatched, so the full
    CFG+STG inference path runs pipeline-parallel.
    """
    from avatar_tpu.models.dit import _block_apply, _dit_epilogue, _dit_prologue

    blocks = params["blocks"]
    assert not isinstance(blocks, list), (
        "dit_apply_pp needs stacked blocks (stack_block_params) so the "
        "stage axis can shard; got a per-block list"
    )
    num_layers = jax.tree.leaves(blocks)[0].shape[0]
    stages = mesh.shape[axis]
    assert num_layers % stages == 0, (num_layers, stages)

    b = hidden_states.shape[0]
    # default: the most microbatches that evenly divide the batch, capped at
    # the stage count (more than S microbatches shrinks the bubble further
    # but the default favors fewer, larger microbatches)
    m = num_microbatches or max(
        d for d in range(1, min(b, stages) + 1) if b % d == 0
    )
    assert b % m == 0, f"batch {b} not divisible by microbatches {m}"
    b_m = b // m
    if data_axis is not None and b_m % mesh.shape[data_axis] != 0:
        # tiny batches can't also shard over data — replicate them (the
        # pipeline still stage-parallelizes the blocks)
        data_axis = None

    lora_blocks = None if lora is None else lora["blocks"]
    if lora_blocks is not None:
        assert not isinstance(lora_blocks, list), "stack lora['blocks'] too"

    ckv = None
    if cross_kv is not None:
        if isinstance(cross_kv[0], (tuple, list)):  # per-block sequence
            ckv = (
                jnp.stack([kv[0] for kv in cross_kv]),
                jnp.stack([kv[1] for kv in cross_kv]),
            )
        else:  # already stacked (k[L, B, Lk, C], v[L, B, Lk, C])
            ckv = (cross_kv[0], cross_kv[1])
        assert ckv[0].shape[0] == num_layers, (ckv[0].shape, num_layers)

    x, freqs_cis, ada_t, embedded_t, enc = _dit_prologue(
        params, cfg, hidden_states, indices_grid, timestep,
        encoder_hidden_states, freqs_cis=freqs_cis, rope_split=rope_split,
        cross_kv_given=ckv is not None,
    )

    def mb(t):  # [B, ...] -> [M, B/M, ...]
        return None if t is None else t.reshape(m, b_m, *t.shape[1:])

    def mb_layer(t):  # [L, B, ...] -> [L, M, B/M, ...]
        return None if t is None else t.reshape(
            t.shape[0], m, b_m, *t.shape[2:]
        )

    x_mb = mb(x)
    cos_mb, sin_mb = mb(freqs_cis[0]), mb(freqs_cis[1])
    ada_mb = mb(ada_t)
    enc_mb = mb(enc)
    mask_mb = mb(
        encoder_attention_mask
        if (enc is not None or ckv is not None) else None
    )
    slm_mb = mb_layer(skip_layer_mask)
    ckv_mb = None if ckv is None else jax.tree.map(mb_layer, ckv)

    dspec = data_axis  # batch axis of each microbatch
    act_spec = P(None, dspec)
    layer_spec = P(axis, None, dspec)  # [L over pp, M, b_m, ...]
    in_specs = (
        P(axis),        # blocks (prefix: leading block axis over pp)
        P(axis),        # lora blocks (or None — no leaves)
        act_spec,       # x_mb [M, b_m, N, inner]
        act_spec,       # cos_mb
        act_spec,       # sin_mb
        act_spec,       # ada_mb
        act_spec,       # enc_mb (or None)
        act_spec,       # mask_mb (or None)
        layer_spec,     # slm_mb (or None)
        layer_spec,     # ckv_mb (or None)
    )

    checkpoint_policy = None
    if isinstance(remat, str) and remat not in ("", "full"):
        checkpoint_policy = {
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }[remat]

    @partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=act_spec,
        check_vma=False,
    )
    def pipeline(blk, lra, xs, cos, sin, ada, eh, eam, slm, ckv_l):
        sid = jax.lax.axis_index(axis)
        is_first = sid == 0
        is_last = sid == stages - 1

        def stage(x_in, mb_idx):
            take = lambda t, ax=0: (
                None if t is None
                else jax.lax.dynamic_index_in_dim(t, mb_idx, ax, keepdims=False)
            )
            fc = (take(cos), take(sin))
            ad, e, am = take(ada), take(eh), take(eam)
            # layer-stacked operands: microbatch axis is 1 (0 is the local
            # block axis the scan consumes)
            sl = take(slm, 1)  # [L_local, b_m] or None
            kv = (
                None if ckv_l is None
                else jax.tree.map(lambda t: take(t, 1), ckv_l)
            )

            def body(xx, per_block):
                bp, lp, sl_i, kv_i = per_block

                def run(bp, xx):
                    return _block_apply(
                        bp, xx, cfg, fc, ad, e, am, sl_i,
                        skip_layer_strategy,
                        attention_impl=attention_impl,
                        lora=lp, lora_scale=lora_scale,
                        rope_split=rope_split, cross_kv=kv_i,
                    )

                if remat:
                    run = jax.checkpoint(run, policy=checkpoint_policy)
                return run(bp, xx), None

            out, _ = jax.lax.scan(body, x_in, (blk, lra, sl, kv))
            return out

        def tick(carry, t):
            recv, outs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            x_in = jnp.where(is_first, feed, recv)
            y = stage(x_in, jnp.clip(t - sid, 0, m - 1))
            recv_n = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(stages - 1)]
            )
            # last stage drains microbatch t-(S-1); earlier/garbage ticks
            # rewrite the slot with its current value (no-op)
            oi = jnp.clip(t - (stages - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, oi, 0, keepdims=False)
            upd = jnp.where(is_last & (t - (stages - 1) >= 0), y, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, upd, oi, 0)
            return (recv_n, outs), None

        recv0 = jnp.zeros(xs.shape[1:], xs.dtype)
        outs0 = jnp.zeros(xs.shape, xs.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (recv0, outs0), jnp.arange(m + stages - 1)
        )
        # results live on the last stage; zero elsewhere -> psum broadcasts
        outs = jnp.where(is_last, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    out = pipeline(blocks, lora_blocks, x_mb, cos_mb, sin_mb, ada_mb,
                   enc_mb, mask_mb, slm_mb, ckv_mb)
    out = out.reshape(b, *out.shape[2:])
    return _dit_epilogue(params, out, embedded_t)
