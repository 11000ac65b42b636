"""Long-video windowed generation (`pipelines/long_video.py`).

The reference has no video-extension mechanism (one fixed `num_frames` per
call, pipeline_ltx_video.py:722-766); avatar_tpu's windowed generator is
new surface. Tests pin: the windowing grammar, output shape/dtype/trim,
determinism, single-window passthrough equivalence, handoff continuity
(seams are no worse than within-window motion AND strictly better than
naive unconditioned concatenation), the blend/adain knobs, and pose-driven
windows with short-pose padding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.diffusion import RectifiedFlowSchedule
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import demo_config, init_vae
from avatar_tpu.pipelines import (
    GenerationParams,
    LTXVideoPipeline,
    LongVideoParams,
    generate_long_video,
    window_starts,
)

H = W = 32


def test_window_starts_grammar():
    assert window_starts(25, 17, 9) == [0, 8]
    assert window_starts(17, 17, 9) == [0]
    assert window_starts(5, 17, 9) == [0]
    assert window_starts(33, 17, 9) == [0, 8, 16]
    # stride covers: last window must reach past total
    for total in (18, 40, 97):
        starts = window_starts(total, 17, 9)
        assert starts[-1] + 17 >= total
        if len(starts) > 1:
            assert starts[-1] - 8 + 17 < total  # no superfluous window


def test_params_validation():
    with pytest.raises(ValueError, match="window_frames"):
        LongVideoParams(num_frames=30, window_frames=16)
    with pytest.raises(ValueError, match="overlap_frames"):
        LongVideoParams(num_frames=30, window_frames=17, overlap_frames=8)
    with pytest.raises(ValueError, match="overlap_frames"):
        LongVideoParams(num_frames=30, window_frames=17, overlap_frames=17)
    with pytest.raises(ValueError, match="num_frames"):
        LongVideoParams(num_frames=0, window_frames=17)


@pytest.fixture(scope="module")
def pipeline():
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32,
        decoder_base_channels=32,
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
        schedule=RectifiedFlowSchedule.create(sampler="Uniform"),
        attention_impl="xla",
    )


def _prompt(b=1, l=8, dim=32, key=11):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    return jax.random.normal(ks[0], (b, l, dim)), jnp.ones((b, l))


def _gen_params(steps=2):
    return GenerationParams(
        height=H, width=W, num_frames=17, frame_rate=25.0,
        num_inference_steps=steps, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0,
    )


def _long(pipeline, long, key=0, output_type="np", **kw):
    embeds, mask = _prompt()
    return generate_long_video(
        pipeline, _gen_params(), long, jax.random.PRNGKey(key),
        embeds, mask, output_type=output_type, dtype=jnp.float32, **kw,
    )


def test_shape_trim_dtype_and_determinism(pipeline):
    long = LongVideoParams(num_frames=29, window_frames=17, overlap_frames=9)
    out = _long(pipeline, long)
    assert out.shape == (1, 29, H, W, 3)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    out2 = _long(pipeline, long)
    np.testing.assert_array_equal(out, out2)
    u8 = _long(pipeline, long, output_type="uint8")
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        u8, (out * 255.0 + 0.5).astype(np.uint8)
    )


def test_single_window_matches_direct_pipeline(pipeline):
    long = LongVideoParams(num_frames=17, window_frames=17, overlap_frames=9)
    out = _long(pipeline, long, key=3)
    embeds, mask = _prompt()
    k = jax.random.fold_in(jax.random.PRNGKey(3), 0)
    lat = pipeline(_gen_params(), k, embeds, mask, output_type="latent",
                   dtype=jnp.float32)
    direct = np.asarray(pipeline.decode_latents(
        lat, _gen_params(), key=jax.random.fold_in(k, 7), output_type="np"
    ))
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_handoff_carries_information_across_windows(pipeline):
    """Window 2 must depend on window 1's CONTENT through the handoff (not
    just on shared keys): perturbing window 1 via a first-window user
    conditioning item — with every PRNG key identical — must change window
    2's frames. Pixel-space continuity itself is untestable on a random
    init (the random VAE's encode->decode is no identity and decoded frames
    have no temporal smoothness); the frozen-conditioning guarantee that
    makes the seam work on real weights is pinned by the pipeline suite
    (tests/test_pipeline.py, tests/test_solver.py frozen-token tests)."""
    long = LongVideoParams(num_frames=25, window_frames=17, overlap_frames=9)
    from avatar_tpu.pipelines import ConditioningItem

    image = jax.random.normal(jax.random.PRNGKey(31), (1, 1, H, W, 3))
    out_base = _long(pipeline, long, key=5)
    out_cond = _long(
        pipeline, long, key=5,
        conditioning_items=[ConditioningItem(image, 0, 1.0)],
    )
    s, v = 8, 9
    # window 1 changed (the user item conditions it) ...
    assert not np.array_equal(out_base[:, :s], out_cond[:, :s])
    # ... and so did window 2's exclusive region — content flowed through
    # the handoff even though window 2's own keys/noise are identical
    assert not np.array_equal(
        out_base[:, s + v :], out_cond[:, s + v :]
    )


def test_blend_only_touches_overlap(pipeline):
    long_b = LongVideoParams(num_frames=25, window_frames=17,
                             overlap_frames=9, blend_overlap=True)
    long_nb = dataclasses.replace(long_b, blend_overlap=False)
    out_b = _long(pipeline, long_b, key=7)
    out_nb = _long(pipeline, long_nb, key=7)
    s, v = 8, 9
    # outside the overlap the two stitches are identical
    np.testing.assert_array_equal(out_b[:, :s], out_nb[:, :s])
    np.testing.assert_array_equal(out_b[:, s + v :], out_nb[:, s + v :])
    # the crossfade actually changed the overlap interior (first overlap
    # frame has weight 0 -> identical by construction)
    assert not np.array_equal(out_b[:, s + 1 : s + v], out_nb[:, s + 1 : s + v])
    np.testing.assert_array_equal(out_b[:, s], out_nb[:, s])


def test_adain_anchor_runs_and_changes_later_windows(pipeline):
    long = LongVideoParams(num_frames=25, window_frames=17, overlap_frames=9)
    long_a = dataclasses.replace(long, adain_anchor=True)
    out = _long(pipeline, long, key=9)
    out_a = _long(pipeline, long_a, key=9)
    # window 0 region (pre-overlap) is identical; later frames differ
    np.testing.assert_array_equal(out[:, :8], out_a[:, :8])
    assert not np.array_equal(out[:, 17:], out_a[:, 17:])
    assert np.isfinite(out_a).all()


def test_pose_driven_windows_with_short_pose(pipeline):
    """Avatar path: ref + pose sliced per window; a pose track shorter than
    the covered span is last-frame padded rather than erroring."""
    ref = jax.random.normal(jax.random.PRNGKey(21), (1, 1, H, W, 3))
    pose = jax.random.normal(jax.random.PRNGKey(22), (1, 20, H, W, 3))
    long = LongVideoParams(num_frames=25, window_frames=17, overlap_frames=9)
    out = _long(pipeline, long, key=13, ref_image=ref, pose_frames=pose)
    assert out.shape == (1, 25, H, W, 3)
    assert np.isfinite(out).all()
    # the pose actually conditions the output
    pose2 = jax.random.normal(jax.random.PRNGKey(23), (1, 20, H, W, 3))
    out2 = _long(pipeline, long, key=13, ref_image=ref, pose_frames=pose2)
    assert not np.array_equal(out, out2)


def test_rejects_latent_output(pipeline):
    long = LongVideoParams(num_frames=25, window_frames=17, overlap_frames=9)
    with pytest.raises(ValueError, match="output_type"):
        _long(pipeline, long, output_type="latent")
