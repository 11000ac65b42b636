"""Ulysses sequence-parallel attention on the 8-virtual-device mesh:
the token-sharded path must bit-match unsharded attention."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from avatar_tpu.ops.attention import xla_attention
from avatar_tpu.parallel.sequence import (
    ulysses_attention,
    ulysses_cross_attention,
)


@pytest.fixture(scope="module")
def sp_mesh():
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devices, axis_names=("sp",))


def test_ulysses_self_attention_matches(sp_mesh):
    b, h, n, d = 2, 8, 256, 16  # heads divisible by 8 shards
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))

    ref = xla_attention(q, k, v)

    fn = shard_map(
        partial(ulysses_attention, axis_name="sp", attention_impl="xla"),
        mesh=sp_mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_with_kv_mask(sp_mesh):
    b, h, n, d = 1, 8, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    mask = (jax.random.uniform(ks[3], (b, n)) > 0.3).astype(jnp.float32)
    bias = jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)

    ref = xla_attention(q, k, v, bias)

    fn = shard_map(
        lambda q, k, v, m: ulysses_attention(
            q, k, v, axis_name="sp", kv_mask=m, attention_impl="xla"
        ),
        mesh=sp_mesh,
        in_specs=(
            P(None, None, "sp", None), P(None, None, "sp", None),
            P(None, None, "sp", None), P(None, "sp"),
        ),
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_cross_attention_matches(sp_mesh):
    """Token-sharded queries against replicated short kv (text tokens)."""
    b, h, nq, lkv, d = 1, 8, 256, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, nq, d))
    k = jax.random.normal(ks[1], (b, h, lkv, d))
    v = jax.random.normal(ks[2], (b, h, lkv, d))

    ref = xla_attention(q, k, v)
    fn = shard_map(
        partial(ulysses_cross_attention, axis_name="sp", attention_impl="xla"),
        mesh=sp_mesh,
        in_specs=(P(None, None, "sp", None), P(), P()),
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dit_apply_sp_matches_unsharded(sp_mesh):
    """Full DiT under shard_map with token-sharded activations bit-matches
    the unsharded forward (with rope_split+cross_kv optimizations too)."""
    from avatar_tpu.models.dit import (
        DiTConfig,
        dit_apply,
        init_dit,
        permute_dit_params_for_split_rope,
        precompute_cross_attention_kv,
    )
    from avatar_tpu.ops.rope import get_latent_coords
    from avatar_tpu.parallel.sequence import dit_apply_sp

    cfg = DiTConfig(
        num_attention_heads=8, attention_head_dim=8, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=96,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 2, 4, 4, 4
    tokens = jax.random.normal(jax.random.PRNGKey(1), (b, f * h * w, 16))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, 96))
    mask = jnp.ones((b, 8))
    t = jnp.asarray([0.5, 0.9])

    base = dit_apply(params, cfg, tokens, grid, t, text, mask,
                     attention_impl="xla")
    out = dit_apply_sp(params, cfg, tokens, grid, t, text, mask,
                       mesh=sp_mesh, attention_impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)

    # with the inference-optimized layout (split rope + precomputed cross kv)
    p_split = permute_dit_params_for_split_rope(params, cfg)
    cross_kv, _ = precompute_cross_attention_kv(params, cfg, text)
    out_opt = dit_apply_sp(p_split, cfg, tokens, grid, t, None, mask,
                           mesh=sp_mesh, attention_impl="xla",
                           rope_split=True, cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(base),
                               atol=2e-5)

    # per-token timesteps shard over the token axis too
    t_tok = jnp.full((b, f * h * w), 0.5).at[:, 0].set(0.0)
    base_tok = dit_apply(params, cfg, tokens, grid, t_tok, text, mask,
                         attention_impl="xla")
    out_tok = dit_apply_sp(params, cfg, tokens, grid, t_tok, text, mask,
                           mesh=sp_mesh, attention_impl="xla")
    np.testing.assert_allclose(np.asarray(out_tok), np.asarray(base_tok),
                               atol=2e-5)


def test_pipeline_sequence_parallel_matches(sp_mesh):
    """Whole generation pipeline with sp_mesh == unsharded pipeline output
    (VERDICT round-1 item 2 'done' criterion)."""
    import dataclasses

    from avatar_tpu.diffusion import RectifiedFlowSchedule
    from avatar_tpu.models.dit import DiTConfig, init_dit
    from avatar_tpu.models.vae import demo_config, init_vae
    from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32,
        decoder_base_channels=32,
    )
    dit_cfg = DiTConfig(
        num_attention_heads=8, attention_head_dim=8, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), dit_cfg)
    sched = RectifiedFlowSchedule.create(
        sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
    )

    def build(sp):
        return LTXVideoPipeline(
            dit_cfg, dit_params, vae_cfg, vae_params, schedule=sched,
            attention_impl="xla", sp_mesh=sp_mesh if sp else None,
        )

    h = w = 64
    frames = 9  # latent tokens: 2 x 2 x 2 = 8, divisible by 8 devices
    params = GenerationParams(
        height=h, width=w, num_frames=frames, frame_rate=25.0,
        num_inference_steps=2, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    mask = jnp.ones((1, 8))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 1, h, w, 3))
    pose = jax.random.normal(jax.random.PRNGKey(4), (1, frames, h, w, 3))

    out_base = build(False)(
        params, jax.random.PRNGKey(0), embeds, mask, ref_image=ref,
        pose_frames=pose, dtype=jnp.float32,
    )
    out_sp = build(True)(
        params, jax.random.PRNGKey(0), embeds, mask, ref_image=ref,
        pose_frames=pose, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_base), atol=3e-5
    )


def test_dit_apply_sp_backward_matches(sp_mesh):
    """SP gradients (VERDICT r2 item 8: SP was forward-only everywhere).

    shard_map transposes the Ulysses all-to-alls in the backward pass;
    grads of a velocity-style loss wrt params AND tokens must match the
    unsharded dit_apply backward on the 8-device CPU mesh.
    """
    from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
    from avatar_tpu.ops.rope import get_latent_coords
    from avatar_tpu.parallel.sequence import dit_apply_sp

    cfg = DiTConfig(
        num_attention_heads=8, attention_head_dim=8, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=96,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 2, 4, 4, 4
    tokens = jax.random.normal(jax.random.PRNGKey(1), (b, f * h * w, 16))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, 96))
    mask = jnp.ones((b, 8))
    t = jnp.asarray([0.5, 0.9])
    target = jax.random.normal(jax.random.PRNGKey(3), tokens.shape)

    def loss_base(p, x):
        out = dit_apply(p, cfg, x, grid, t, text, mask,
                        attention_impl="xla")
        return jnp.mean((out - target) ** 2)

    def loss_sp(p, x):
        out = dit_apply_sp(p, cfg, x, grid, t, text, mask,
                           mesh=sp_mesh, attention_impl="xla")
        return jnp.mean((out - target) ** 2)

    (l0, g0), (l1, g1) = (
        jax.value_and_grad(loss_base, argnums=(0, 1))(params, tokens),
        jax.value_and_grad(loss_sp, argnums=(0, 1))(params, tokens),
    )
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0[0])
    flat1 = jax.tree.leaves(g1[0])
    assert len(flat0) == len(flat1)
    for (path, a), bb in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               atol=3e-5)


def test_dit_apply_sp_backward_flash(sp_mesh):
    """Same but through the Pallas kernels (interpret mode on CPU) — the
    production SP training combination."""
    from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
    from avatar_tpu.ops.rope import get_latent_coords
    from avatar_tpu.parallel.sequence import dit_apply_sp

    cfg = DiTConfig(
        num_attention_heads=8, attention_head_dim=16, in_channels=16,
        out_channels=16, num_layers=1, cross_attention_dim=128,
        caption_channels=96,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 1, 4, 8, 4
    tokens = jax.random.normal(jax.random.PRNGKey(1), (b, f * h * w, 16))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, 96))
    mask = jnp.ones((b, 8))
    t = jnp.asarray([0.7])
    target = jax.random.normal(jax.random.PRNGKey(3), tokens.shape)

    def loss(p, impl):
        def inner(pp):
            out = (
                dit_apply(pp, cfg, tokens, grid, t, text, mask,
                          attention_impl="xla")
                if impl == "base"
                else dit_apply_sp(pp, cfg, tokens, grid, t, text, mask,
                                  mesh=sp_mesh, attention_impl="flash")
            )
            return jnp.mean((out - target) ** 2)
        return inner

    with jax.default_matmul_precision("highest"):
        l0, g0 = jax.value_and_grad(loss(params, "base"))(params)
        l1, g1 = jax.value_and_grad(loss(params, "sp"))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for a, bb in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=2e-4)
