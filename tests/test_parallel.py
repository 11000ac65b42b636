"""Sharding tests on the 8-virtual-device CPU mesh: TP-sharded DiT forward
matches the unsharded result; VAE tiling matches untiled decode within
blend tolerance; sharded generation pipeline runs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
from avatar_tpu.ops.rope import get_latent_coords
from avatar_tpu.parallel import (
    dit_param_sharding,
    make_mesh,
    param_sharding,
    shard_pytree,
)

# cross_attention_dim == inner_dim (as in the real 2B config): attn2 keys
# come from the caption projection, which outputs inner_dim features
DIT = DiTConfig(
    num_attention_heads=4, attention_head_dim=8, in_channels=8,
    out_channels=8, num_layers=2, cross_attention_dim=32, caption_channels=24,
)


def _inputs(b=2, f=3, h=2, w=2, l=8):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    tokens = jax.random.normal(ks[0], (b, f * h * w, DIT.in_channels))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(ks[1], (b, l, DIT.caption_channels))
    return tokens, grid, text, jnp.ones((b, l))


def test_tp_sharded_dit_matches_unsharded():
    assert jax.device_count() == 8
    mesh = make_mesh(data=2, fsdp=2, tp=2)
    params = init_dit(jax.random.PRNGKey(1), DIT)
    tokens, grid, text, mask = _inputs()
    t = jnp.asarray([0.5, 0.7])

    ref = dit_apply(params, DIT, tokens, grid, t, text, mask, attention_impl="xla")

    shardings = dit_param_sharding(mesh, params, mode="fsdp", min_size=64)
    sharded = shard_pytree(params, shardings)
    # verify TP actually sharded attention projections
    qs = sharded["blocks"][0]["attn1"]["to_q"]["kernel"].sharding
    assert "tp" in str(qs.spec), qs.spec

    with mesh:
        out = jax.jit(
            lambda p, x: dit_apply(p, DIT, x, grid, t, text, mask,
                                   attention_impl="xla")
        )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vae_tiling_matches_untiled():
    from avatar_tpu.models.vae import (
        decoder_apply, demo_config, encoder_apply, init_vae, posterior_mode,
    )
    from avatar_tpu.models.vae_tiling import (
        blend_t, hw_tiled_decode, z_tiled_decode, z_tiled_encode,
    )

    cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32, decoder_base_channels=32
    )
    params = init_vae(jax.random.PRNGKey(0), cfg)
    media = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 64, 64, 3))

    # z-tiled encode with one chunk == plain encode
    m_full = encoder_apply(params["encoder"], cfg, media)
    m_tiled = z_tiled_encode(params, cfg, media, z_sample_size=16)
    np.testing.assert_allclose(np.asarray(m_tiled), np.asarray(m_full), atol=1e-5)

    latents = posterior_mode(m_full)
    t = jnp.full((1,), 0.1)
    d_full = decoder_apply(params["decoder"], cfg, latents, timestep=t)

    # hw tiling with one full-size tile (no overlap) == plain decode
    d_hw = hw_tiled_decode(
        params, cfg, latents, t, tile_sample_size=64, overlap_factor=0.0
    )
    np.testing.assert_allclose(np.asarray(d_hw), np.asarray(d_full), atol=1e-4)

    # multi-chunk z decode: each causal chunk of s latent frames decodes to
    # (s-1)*temporal_factor+1 frames (the reference's approximation has the
    # same per-chunk expansion); 2 chunks of 1 latent frame -> 2 frames
    d_z = z_tiled_decode(params, cfg, latents, t, z_sample_size=8)
    assert d_z.shape[1] == latents.shape[1]  # 1 frame per 1-latent chunk
    assert d_z.shape[2:] == d_full.shape[2:]

    # blend_t: full crossfade of identical tensors is identity
    a = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(blend_t(a, a, 4, axis=1)), np.asarray(a), atol=1e-6
    )


def test_sharded_generation_pipeline():
    """Full generation with data-sharded batch + fsdp-sharded params on the
    CPU mesh (inference-side parallelism)."""
    from avatar_tpu.models.vae import demo_config, init_vae
    from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

    mesh = make_mesh(data=2, fsdp=4)
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32, decoder_base_channels=32
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), DIT)
    p_shard = param_sharding(mesh, dit_params, mode="fsdp", min_size=64)
    dit_params = shard_pytree(dit_params, p_shard)

    pipe = LTXVideoPipeline(DIT, dit_params, vae_cfg, vae_params,
                            attention_impl="xla")
    embeds = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 24))
    mask = jnp.ones((2, 8))
    with mesh:
        out = pipe(
            GenerationParams(
                height=64, width=64, num_frames=8, num_inference_steps=2,
                guidance_scale=1.0, stg_scale=0.0, rescaling_scale=1.0,
                decode_timestep=0.05,
            ),
            jax.random.PRNGKey(3), embeds, mask, dtype=jnp.float32,
        )
    assert out.shape == (2, 9, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_zero2_optimizer_sharding():
    """ZeRO-2 parity: params replicated, AdamW moments sharded over 'fsdp';
    the train step keeps moment shardings and the loss is finite."""
    from avatar_tpu.core.config import TrainConfig
    from avatar_tpu.parallel import opt_state_sharding, param_sharding
    from avatar_tpu.train.train import (
        init_trainable, make_optimizer, make_train_step,
    )

    mesh = make_mesh(data=2, fsdp=4)
    cfg = TrainConfig(
        checkpoint_path="x", learning_rate=1e-3, lora_rank=4, lora_alpha=4,
        rf_log_normal_mu=-0.5, rf_log_normal_sigma=1.0,
        train_mode="lora_audio", gradient_accumulation_steps=1, batch_size=8,
        sharding_mode="zero2",
    )
    params = init_dit(jax.random.PRNGKey(0), DIT)
    p_shard = param_sharding(mesh, params, mode="zero2", min_size=64)
    params = shard_pytree(params, p_shard)  # replicated in zero2
    trainable = init_trainable(jax.random.PRNGKey(1), params, DIT, cfg)
    t_shard = param_sharding(mesh, trainable, mode="zero2", min_size=64)
    trainable = shard_pytree(trainable, t_shard)

    opt = make_optimizer(cfg)
    opt_state = opt.init(trainable)
    o_shard = opt_state_sharding(mesh, opt_state, t_shard, mode="zero2",
                                 min_size=64)
    opt_state = jax.tree.map(jax.device_put, opt_state, o_shard)
    # a large moment leaf is actually sharded over fsdp
    big = [
        s for s in jax.tree.leaves(o_shard)
        if "fsdp" in str(getattr(s, "spec", ""))
    ]
    assert big, "no optimizer leaf sharded over fsdp in zero2 mode"

    step = make_train_step(DIT, cfg, opt, attention_impl="xla")
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    batch = {
        "latents": jax.random.normal(ks[0], (1, 8, 3, 2, 2, DIT.in_channels)),
        "pose_latents": jax.random.normal(ks[1], (1, 8, 3, 2, 2, DIT.in_channels)),
        "ref_image_latents": jax.random.normal(ks[2], (1, 8, 1, 2, 2, DIT.in_channels)),
    }
    embeds = jax.random.normal(jax.random.PRNGKey(3), (1, 8, DIT.caption_channels))
    with mesh:
        t1, o1, m = step(
            trainable, opt_state, params, batch, embeds, jnp.ones((1, 8)),
            jax.random.PRNGKey(4),
        )
    assert np.isfinite(float(m["loss"]))
