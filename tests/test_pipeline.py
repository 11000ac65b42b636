"""End-to-end pipeline tests on a tiny synthetic model (mirrors the
reference's tests/test_inference.py strategy: tiny random VAE + 2-layer
transformer, 1-3 denoising steps, several conditioning modes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.diffusion import RectifiedFlowSchedule
from avatar_tpu.models.dit import DiTConfig, SkipLayerStrategy, init_dit
from avatar_tpu.models.vae import demo_config, init_vae
from avatar_tpu.pipelines import ConditioningItem, GenerationParams, LTXVideoPipeline

H = W = 64
FRAMES = 9


@pytest.fixture(scope="module")
def pipeline():
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32, decoder_base_channels=32
    )
    dit_cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=8, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=32,
        caption_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), dit_cfg)
    return LTXVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params,
        schedule=RectifiedFlowSchedule.create(
            sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
        ),
        attention_impl="xla",
    )


def _prompt(b=1, l=8, dim=32, key=11):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    return (
        jax.random.normal(ks[0], (b, l, dim)),
        jnp.ones((b, l)),
    )


def _params(**kw):
    base = dict(
        height=H, width=W, num_frames=FRAMES, frame_rate=25.0,
        num_inference_steps=2, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )
    base.update(kw)
    return GenerationParams(**base)


@pytest.mark.smoke
def test_unconditional_generation(pipeline):
    embeds, mask = _prompt()
    out = pipeline(
        _params(), jax.random.PRNGKey(0), embeds, mask, dtype=jnp.float32
    )
    assert out.shape == (1, FRAMES, H, W, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0


def test_avatar_ref_pose_generation(pipeline):
    """The avatar flow: ref image + pose frames drive the in-transformer lerp."""
    embeds, mask = _prompt()
    ref = jax.random.normal(jax.random.PRNGKey(2), (1, 1, H, W, 3))
    pose = jax.random.normal(jax.random.PRNGKey(3), (1, FRAMES, H, W, 3))
    out = pipeline(
        _params(), jax.random.PRNGKey(0), embeds, mask,
        ref_image=ref, pose_frames=pose, dtype=jnp.float32,
    )
    assert out.shape == (1, FRAMES, H, W, 3)
    base = pipeline(_params(), jax.random.PRNGKey(0), embeds, mask, dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-3)


def test_first_frame_conditioning(pipeline):
    """ConditioningItem at frame 0 produces a conditioning mask and freezes
    hard-conditioned tokens."""
    embeds, mask = _prompt()
    image = jax.random.normal(jax.random.PRNGKey(4), (1, 1, H, W, 3))
    out = pipeline(
        _params(), jax.random.PRNGKey(0), embeds, mask,
        conditioning_items=[ConditioningItem(image, 0, 1.0)],
        dtype=jnp.float32,
    )
    assert out.shape == (1, FRAMES, H, W, 3)


def test_sequence_and_frame_conditioning(pipeline):
    """First sequence + non-first frame-0-sequence combo (extra tokens path)."""
    embeds, mask = _prompt()
    seq = jax.random.normal(jax.random.PRNGKey(5), (1, FRAMES, H, W, 3))
    out = pipeline(
        _params(num_frames=17), jax.random.PRNGKey(0), embeds, mask,
        conditioning_items=[
            ConditioningItem(seq, 0, 0.9),
            ConditioningItem(seq, 8, 0.8),
        ],
        dtype=jnp.float32,
    )
    assert out.shape == (1, 17, H, W, 3)


def test_cfg_and_stg(pipeline):
    """CFG + STG (3-cond batch) with skip blocks and rescaling."""
    embeds, mask = _prompt()
    out = pipeline(
        _params(
            guidance_scale=3.0, stg_scale=1.0, rescaling_scale=0.7,
            skip_block_list=[1], cfg_star_rescale=True,
        ),
        jax.random.PRNGKey(0), embeds, mask, dtype=jnp.float32,
    )
    assert out.shape == (1, FRAMES, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_determinism(pipeline):
    """The same sample index yields identical output across batch sizes
    (reference tests/test_inference.py:106-158)."""
    embeds1, mask1 = _prompt(b=1)
    embeds2 = jnp.concatenate([embeds1, embeds1])
    mask2 = jnp.concatenate([mask1, mask1])
    out1 = pipeline(
        _params(), jax.random.PRNGKey(7), embeds1, mask1,
        output_type="latent", dtype=jnp.float32,
    )
    out2 = pipeline(
        _params(), jax.random.PRNGKey(7), embeds2, mask2,
        output_type="latent", dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-4
    )


def test_vid2vid_skip_initial_steps(pipeline):
    embeds, mask = _prompt()
    media = jax.random.normal(jax.random.PRNGKey(8), (1, FRAMES, H, W, 3))
    out = pipeline(
        _params(num_inference_steps=3, skip_initial_inference_steps=1),
        jax.random.PRNGKey(0), embeds, mask, media_items=media,
        dtype=jnp.float32,
    )
    assert out.shape == (1, FRAMES, H, W, 3)


def test_tone_map_and_adain():
    from avatar_tpu.pipelines import adain_filter_latent, tone_map_latents

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4, 8))
    assert np.allclose(np.asarray(tone_map_latents(x, 0.0)), np.asarray(x))
    y = tone_map_latents(x, 1.0)
    assert np.abs(np.asarray(y)).max() <= np.abs(np.asarray(x)).max()

    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 4, 8)) * 2 + 1
    ad = adain_filter_latent(x, ref)
    # after full AdaIN the per-(b,c) stats match the reference's
    got_mean = np.asarray(ad).mean(axis=(1, 2, 3))
    want_mean = np.asarray(ref).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-4)


def test_offcenter_conditioning_item(pipeline):
    """media_x/media_y spatial placement with latent border stripping
    (pipeline_ltx_video.py:1700-1745): a 64px patch at x=64 of a 128px frame
    keeps one latent column at x=3 after the border strip."""
    # 128px target -> 4x4 latents at 32x downscale; 64px patch -> 2x2 latents
    patch = jax.random.normal(jax.random.PRNGKey(10), (1, 1, 64, 64, 3))
    item = ConditioningItem(patch, 0, 1.0, media_x=64, media_y=0)
    init = jnp.zeros((1, 2, 4, 4, 8))
    tokens, coords, cmask, n_extra = pipeline.prepare_conditioning(
        [item], init, jax.random.PRNGKey(1)
    )
    assert n_extra == 0
    m = np.array(np.asarray(cmask).reshape(1, 2, 4, 4))
    # x_start 64 -> strip left border -> latent x = 96/32 = 3; bottom row
    # stripped (y_end < height) -> only (frame 0, y 0, x 3) is conditioned
    assert m[0, 0, 0, 3] == 1.0
    m[0, 0, 0, 3] = 0.0
    assert m.max() == 0.0


def test_per_timestep_skip_block_list(pipeline):
    """List-of-lists skip_block_list maps through guidance_timesteps so STG
    skips different blocks at different steps (pipeline_ltx_video.py:975-984).
    Constant per-step lists must equal the flat-list run; differing per-step
    lists must change the output."""
    embeds, mask = _prompt()
    common = dict(
        num_inference_steps=2, guidance_scale=1.0, stg_scale=1.0,
        skip_layer_strategy=SkipLayerStrategy.AttentionSkip,
        guidance_timesteps=[1.0, 0.3],
    )
    key = jax.random.PRNGKey(0)

    flat = pipeline(
        _params(**common, skip_block_list=[1]), key, embeds, mask,
        dtype=jnp.float32,
    )
    const = pipeline(
        _params(**common, skip_block_list=[[1], [1]]), key, embeds, mask,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(const), np.asarray(flat), atol=1e-6)

    varying = pipeline(
        _params(**common, skip_block_list=[[1], [0]]), key, embeds, mask,
        dtype=jnp.float32,
    )
    assert not np.allclose(np.asarray(varying), np.asarray(flat), atol=1e-4)


def test_yuv420_output(pipeline):
    """Device-side I420 output: correct plane shape and a valid host
    round-trip via cv2."""
    embeds, mask = _prompt()
    out = pipeline(
        _params(), jax.random.PRNGKey(0), embeds, mask, dtype=jnp.float32,
        output_type="yuv420",
    )
    assert out.shape == (1, FRAMES, H * 3 // 2, W)
    assert out.dtype == jnp.uint8
    try:
        import cv2
    except ImportError:
        return
    bgr = cv2.cvtColor(np.asarray(out[0, 0]), cv2.COLOR_YUV2BGR_I420)
    assert bgr.shape == (H, W, 3)


def test_w8a8_pipeline(pipeline):
    """A w8a8-quantized pipeline generates videos close to the full-precision
    pipeline (int8 MXU path is exercised end-to-end, incl. the split-RoPE
    layout permutation of quantized kernels)."""
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32, decoder_base_channels=32
    )
    dit_cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=8, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=32,
        caption_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), dit_cfg)
    pipe_q = LTXVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params,
        schedule=pipeline.schedule, attention_impl="xla",
        quantize_weights="w8a8",
    )
    embeds, mask = _prompt()
    base = pipeline(_params(), jax.random.PRNGKey(0), embeds, mask,
                    dtype=jnp.float32)
    out = pipe_q(_params(), jax.random.PRNGKey(0), embeds, mask,
                 dtype=jnp.float32)
    assert out.shape == base.shape
    o, b = np.asarray(out), np.asarray(base)
    assert np.isfinite(o).all()
    # int8 perturbs the velocity field slightly; frames stay close in [0,1]
    assert np.abs(o - b).mean() < 0.05, np.abs(o - b).mean()


def test_scan_blocks_pipeline_matches(pipeline):
    """LTXVideoPipeline(scan_blocks=True) — stacked blocks, one lax.scan
    body, depth-independent compile — matches the unrolled pipeline on the
    same seeds, including a CFG+STG run (skip masks scanning the layer
    axis)."""
    pipe_s = LTXVideoPipeline(
        pipeline.dit_cfg, pipeline.raw_dit_params, pipeline.vae_cfg,
        pipeline.vae_params, schedule=pipeline.schedule,
        attention_impl="xla", scan_blocks=True,
    )
    assert not isinstance(pipe_s.dit_params["blocks"], list)
    embeds, mask = _prompt()
    for kw in (
        {},
        dict(guidance_scale=2.0, stg_scale=1.0, skip_block_list=[1],
             rescaling_scale=0.7),
    ):
        p = _params(**kw)
        key = jax.random.PRNGKey(3)
        # f32: in bf16 the scan materializes the carry at each layer
        # boundary where the unroll fuses across blocks — a legitimate
        # ~1-ulp rounding difference, not an equivalence gap
        out = pipeline(p, key, embeds, mask, dtype=jnp.float32)
        out_s = pipe_s(p, key, embeds, mask, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_s), atol=1e-4,
        )
