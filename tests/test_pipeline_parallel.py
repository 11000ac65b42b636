"""GPipe pipeline parallelism on the 8-virtual-device mesh: the
stage-sharded microbatched DiT must bit-match the unsharded forward, and
its gradients (the training path) must match too."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
from avatar_tpu.ops.rope import get_latent_coords
from avatar_tpu.parallel.pipeline import (
    dit_apply_pp,
    make_pp_mesh,
    pp_param_sharding,
    stack_block_params,
    unstack_block_params,
)


CFG = DiTConfig(
    num_attention_heads=4, attention_head_dim=16, in_channels=16,
    out_channels=16, num_layers=4, cross_attention_dim=64,
    caption_channels=64,
)


def _inputs(b=4, f=3, h=4, w=4, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    n = f * h * w
    tokens = jax.random.normal(ks[0], (b, n, CFG.in_channels))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(ks[1], (b, 16, CFG.caption_channels))
    mask = (jax.random.uniform(ks[2], (b, 16)) > 0.2).astype(jnp.float32)
    t = jax.random.uniform(ks[3], (b,), minval=0.1, maxval=1.0)
    return tokens, grid, t, text, mask


def test_stack_unstack_roundtrip():
    params = init_dit(jax.random.PRNGKey(0), CFG)
    stacked = stack_block_params(params["blocks"])
    blocks = unstack_block_params(stacked)
    assert len(blocks) == CFG.num_layers
    for a, b in zip(params["blocks"], blocks):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            a, b,
        )


@pytest.mark.parametrize("pp,data,microbatches", [(4, 2, 2), (2, 1, 4)])
def test_pp_forward_matches_unsharded(pp, data, microbatches):
    mesh = make_pp_mesh(pp=pp, data=data, devices=jax.devices()[: pp * data])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    tokens, grid, t, text, mask = _inputs()

    base = dit_apply(params, CFG, tokens, grid, t, text, mask,
                     attention_impl="xla")

    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    shard = pp_param_sharding(mesh, pp_params)
    pp_params = jax.tree.map(jax.device_put, pp_params, shard)
    assert "pp" in str(
        jax.tree.leaves(pp_params["blocks"])[0].sharding.spec
    )

    out = jax.jit(
        lambda p, x: dit_apply_pp(
            p, CFG, x, grid, t, text, mask, mesh=mesh,
            num_microbatches=microbatches,
            data_axis="data" if data > 1 else None,
            attention_impl="xla",
        )
    )(pp_params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_pp_per_token_timestep():
    mesh = make_pp_mesh(pp=4, data=1, devices=jax.devices()[:4])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    tokens, grid, _, text, mask = _inputs(b=2)
    t_tok = jax.random.uniform(
        jax.random.PRNGKey(9), tokens.shape[:2], minval=0.05, maxval=1.0
    )

    base = dit_apply(params, CFG, tokens, grid, t_tok, text, mask,
                     attention_impl="xla")
    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    out = jax.jit(
        lambda p, x: dit_apply_pp(
            p, CFG, x, grid, t_tok, text, mask, mesh=mesh,
            num_microbatches=2, attention_impl="xla",
        )
    )(pp_params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_pp_gradients_match_unsharded():
    """The pipeline schedule is the training path: grads wrt the block
    params (stage-sharded) and the outer params must match the unsharded
    dit_apply gradients."""
    mesh = make_pp_mesh(pp=4, data=2, devices=jax.devices()[:8])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    tokens, grid, t, text, mask = _inputs()
    target = jax.random.normal(jax.random.PRNGKey(7), tokens.shape)

    def loss_base(p):
        out = dit_apply(p, CFG, tokens, grid, t, text, mask,
                        attention_impl="xla")
        return jnp.mean((out - target) ** 2)

    def loss_pp(p):
        out = dit_apply_pp(p, CFG, tokens, grid, t, text, mask, mesh=mesh,
                           num_microbatches=2, data_axis="data",
                           attention_impl="xla")
        return jnp.mean((out - target) ** 2)

    g_base = jax.grad(loss_base)(params)
    g_base = dict(g_base, blocks=stack_block_params(g_base["blocks"]))

    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    g_pp = jax.jit(jax.grad(loss_pp))(pp_params)

    flat_a, tree_a = jax.tree.flatten(g_base)
    flat_b, tree_b = jax.tree.flatten(g_pp)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4
        )


@pytest.mark.parametrize(
    "strategy", ["TransformerBlock", "AttentionValues"]
)
def test_pp_skip_layer_mask_matches_unsharded(strategy):
    """STG skip masks ride the stage sharding: the per-layer mask's leading
    axis shards over 'pp' like the blocks (VERDICT r2: previously asserted
    out of the schedule)."""
    from avatar_tpu.models.dit import SkipLayerStrategy, create_skip_layer_mask

    mesh = make_pp_mesh(pp=4, data=1, devices=jax.devices()[:4])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    tokens, grid, t, text, mask = _inputs()
    # batch of 4 = 2 samples x 2 conds, perturb cond index 1, skip blocks 1,2
    slm = create_skip_layer_mask(
        CFG.num_layers, 2, 2, 1, skip_block_list=[1, 2]
    )
    strat = getattr(SkipLayerStrategy, strategy)

    base = dit_apply(params, CFG, tokens, grid, t, text, mask,
                     skip_layer_mask=slm, skip_layer_strategy=strat,
                     attention_impl="xla")
    base_noskip = dit_apply(params, CFG, tokens, grid, t, text, mask,
                            attention_impl="xla")
    assert float(jnp.max(jnp.abs(base - base_noskip))) > 1e-6

    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    out = jax.jit(
        lambda p, x, s: dit_apply_pp(
            p, CFG, x, grid, t, text, mask, mesh=mesh,
            num_microbatches=2, attention_impl="xla",
            skip_layer_mask=s, skip_layer_strategy=strat,
        )
    )(pp_params, tokens, slm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_pp_hoisted_cross_kv_matches_unsharded():
    """Hoisted cross-attention k/v (the 40-step-loop-invariant optimization)
    flows through the pipeline schedule stage-sharded over its layer axis."""
    from avatar_tpu.models.dit import precompute_cross_attention_kv

    mesh = make_pp_mesh(pp=2, data=2, devices=jax.devices()[:4])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    tokens, grid, t, text, mask = _inputs()

    cross_kv, _ = precompute_cross_attention_kv(params, CFG, text)
    base = dit_apply(params, CFG, tokens, grid, t, None, mask,
                     cross_kv=cross_kv, attention_impl="xla")
    # sanity: matches the unhoisted forward too
    base_unhoisted = dit_apply(params, CFG, tokens, grid, t, text, mask,
                               attention_impl="xla")
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(base_unhoisted), atol=2e-5
    )

    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    out_seq = jax.jit(
        lambda p, x: dit_apply_pp(
            p, CFG, x, grid, t, None, mask, mesh=mesh,
            num_microbatches=2, data_axis="data", attention_impl="xla",
            cross_kv=cross_kv,
        )
    )(pp_params, tokens)
    np.testing.assert_allclose(np.asarray(out_seq), np.asarray(base),
                               atol=2e-5)

    # pre-stacked form (what a pipeline hoists once per run)
    stacked = (
        jnp.stack([kv[0] for kv in cross_kv]),
        jnp.stack([kv[1] for kv in cross_kv]),
    )
    out_stacked = jax.jit(
        lambda p, x, ck: dit_apply_pp(
            p, CFG, x, grid, t, None, mask, mesh=mesh,
            num_microbatches=2, data_axis="data", attention_impl="xla",
            cross_kv=ck,
        )
    )(pp_params, tokens, stacked)
    np.testing.assert_allclose(np.asarray(out_stacked), np.asarray(base),
                               atol=2e-5)


def test_pp_with_stacked_lora():
    from avatar_tpu.train.lora import init_lora

    mesh = make_pp_mesh(pp=2, data=1, devices=jax.devices()[:2])
    params = init_dit(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), CFG, rank=4)
    # make lora_b nonzero so the adapter actually changes the output
    lora = jax.tree.map(
        lambda x: x + 0.01 * jnp.ones_like(x), lora
    )
    tokens, grid, t, text, mask = _inputs(b=2)

    base = dit_apply(params, CFG, tokens, grid, t, text, mask,
                     attention_impl="xla", lora=lora, lora_scale=1.0)
    base_nolora = dit_apply(params, CFG, tokens, grid, t, text, mask,
                            attention_impl="xla")
    assert float(jnp.max(jnp.abs(base - base_nolora))) > 1e-6

    pp_params = dict(params, blocks=stack_block_params(params["blocks"]))
    pp_lora = dict(lora, blocks=stack_block_params(lora["blocks"]))
    out = jax.jit(
        lambda p, lr, x: dit_apply_pp(
            p, CFG, x, grid, t, text, mask, mesh=mesh,
            num_microbatches=2, attention_impl="xla",
            lora=lr, lora_scale=1.0,
        )
    )(pp_params, pp_lora, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)


def test_pipeline_pipeline_parallel_matches():
    """Whole generation pipeline with pp_mesh == unsharded pipeline output:
    blocks stage-sharded at init, hoisted cross-kv computed stacked (vmap
    over the layer axis), CFG+STG skip masks streamed through the schedule."""
    import dataclasses

    from avatar_tpu.diffusion import RectifiedFlowSchedule
    from avatar_tpu.models.vae import demo_config, init_vae
    from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32,
        decoder_base_channels=32,
    )
    dit_cfg = DiTConfig(
        num_attention_heads=8, attention_head_dim=8, in_channels=8,
        out_channels=8, num_layers=4, cross_attention_dim=64,
        caption_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), dit_cfg)
    sched = RectifiedFlowSchedule.create(
        sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
    )

    def build(pp):
        return LTXVideoPipeline(
            dit_cfg, dit_params, vae_cfg, vae_params, schedule=sched,
            attention_impl="xla",
            pp_mesh=make_pp_mesh(pp=4, data=2) if pp else None,
        )

    h = w = 64
    frames = 9
    params = GenerationParams(
        height=h, width=w, num_frames=frames, frame_rate=25.0,
        num_inference_steps=2, guidance_scale=2.0, stg_scale=1.0,
        rescaling_scale=0.7, decode_timestep=0.05,
        skip_block_list=[1, 2],
    )
    embeds = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    mask = jnp.ones((2, 8))
    ref = jax.random.normal(jax.random.PRNGKey(3), (2, 1, h, w, 3))
    pose = jax.random.normal(jax.random.PRNGKey(4), (2, frames, h, w, 3))
    neg = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 32))

    kwargs = dict(
        negative_prompt_embeds=neg, negative_prompt_attention_mask=mask,
        ref_image=ref, pose_frames=pose, dtype=jnp.float32,
    )
    out_base = build(False)(
        params, jax.random.PRNGKey(0), embeds, mask, **kwargs
    )
    out_pp = build(True)(
        params, jax.random.PRNGKey(0), embeds, mask, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(out_pp), np.asarray(out_base), atol=3e-5
    )
