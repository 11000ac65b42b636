"""Causal video VAE tests — port of /root/reference/tests/test_vae.py plus
decode roundtrip and per-channel normalization checks. Channels-last layout:
[B, F, H, W, C]."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.vae import (
    VAEConfig,
    decoder_apply,
    demo_config,
    encoder_apply,
    init_vae,
    normalize_latents,
    posterior_mode,
    un_normalize_latents,
    vae_decode,
    vae_encode,
)


@pytest.fixture(scope="module")
def vae():
    import dataclasses

    # Narrower than the reference fixture (base 128) to keep CPU tests fast;
    # the block grammar and causality properties are width-independent.
    cfg = dataclasses.replace(
        demo_config(latent_channels=16), base_channels=32, decoder_base_channels=32
    )
    params = init_vae(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_encode_decode_shape(vae):
    cfg, params = vae
    spatial = cfg.spatial_downscale_factor
    temporal = cfg.temporal_downscale_factor
    assert spatial == 4 * 2**3 and temporal == 2**3

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64, 64, 3))
    moments = encoder_apply(params["encoder"], cfg, x)
    latent = posterior_mode(moments)
    assert latent.shape == (2, (17 + 7) // temporal, 64 // spatial, 64 // spatial, 16)

    timestep = jnp.full((2,), 0.1)
    recon = decoder_apply(params["decoder"], cfg, latent, timestep=timestep)
    assert recon.shape == x.shape


def test_temporal_causality(vae):
    """Encoding a prefix of frames must bit-match the corresponding slice of
    the full encoding (reference tests/test_vae.py:32-45)."""
    cfg, params = vae
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 17, 64, 64, 3))
    latent = posterior_mode(encoder_apply(params["encoder"], cfg, x))

    image_latent = posterior_mode(encoder_apply(params["encoder"], cfg, x[:, :1]))
    np.testing.assert_allclose(
        np.asarray(image_latent), np.asarray(latent[:, :1]), atol=1e-5
    )

    seq_latent = posterior_mode(encoder_apply(params["encoder"], cfg, x[:, :9]))
    np.testing.assert_allclose(
        np.asarray(seq_latent), np.asarray(latent[:, :2]), atol=1e-5
    )


@pytest.mark.parametrize(
    "layer_name,expected_temporal,expected_spatial",
    [
        ("compress_space_res", 1, 2),
        ("compress_space", 1, 2),
        ("compress_time_res", 2, 1),
        ("compress_time", 2, 1),
        ("compress_all_res", 2, 2),
        ("compress_all", 2, 2),
    ],
)
def test_downscale_factors(layer_name, expected_temporal, expected_spatial):
    cfg = VAEConfig.from_dict(
        {
            "_class_name": "CausalVideoAutoencoder",
            "dims": 3,
            "encoder_blocks": [(layer_name, {"multiplier": 2})],
            "decoder_blocks": [("compress_all", {"residual": True, "multiplier": 2})],
            "latent_channels": 16,
            "norm_layer": "pixel_norm",
            "patch_size": 4,
            "latent_log_var": "uniform",
            "use_quant_conv": False,
            "causal_decoder": False,
            "timestep_conditioning": True,
            "spatial_padding_mode": "replicate",
        }
    )
    assert cfg.temporal_downscale_factor == expected_temporal
    assert cfg.spatial_downscale_factor == expected_spatial * 4


def test_vae_encode_decode_wrappers(vae):
    """vae_encode/vae_decode with per-channel normalization roundtrip."""
    cfg, params = vae
    params = dict(params)
    params["per_channel_statistics"] = {
        "std_of_means": jnp.asarray(np.random.default_rng(0).uniform(0.5, 2.0, 16), jnp.float32),
        "mean_of_means": jnp.asarray(np.random.default_rng(1).normal(0, 1, 16), jnp.float32),
    }
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 9, 64, 64, 3))
    lat = vae_encode(
        params, cfg, x, key=jax.random.PRNGKey(4),
        sample_posterior=True, per_channel_normalize=True,
    )
    assert lat.shape == (1, 2, 2, 2, 16)
    # normalize/un_normalize are exact inverses
    back = un_normalize_latents(
        normalize_latents(lat, params, cfg, True), params, cfg, True
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), rtol=1e-5, atol=1e-5)

    out = vae_decode(
        params, cfg, lat, timestep=jnp.full((1,), 0.05),
        per_channel_normalize=True,
    )
    assert out.shape == (1, 9, 64, 64, 3)


def test_uniform_logvar_structure(vae):
    """latent_log_var='uniform': logvar channels are one repeated channel
    (causal_video_autoencoder.py:527-544)."""
    cfg, params = vae
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 32, 32, 3))
    moments = encoder_apply(params["encoder"], cfg, x)
    assert moments.shape[-1] == 32
    logvar = np.asarray(moments[..., 16:])
    np.testing.assert_allclose(logvar, logvar[..., :1] * np.ones_like(logvar))


def test_jit_encode(vae):
    cfg, params = vae
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 9, 32, 32, 3))
    f = jax.jit(lambda p, x: encoder_apply(p, cfg, x))
    a = f(params["encoder"], x)
    b = encoder_apply(params["encoder"], cfg, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_normalize_latent_channels():
    """BatchNorm-style latent normalization with running stats
    (vae.py:62-68,261-284): encode normalizes the mean half, decode inverts."""
    import dataclasses

    cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32,
        decoder_base_channels=32, normalize_latent_channels=True,
    )
    params = init_vae(jax.random.PRNGKey(0), cfg)
    assert "latent_norm" in params
    rng_ = np.random.default_rng(0)
    params["latent_norm"] = {
        "running_mean": jnp.asarray(rng_.normal(size=8).astype(np.float32)),
        "running_var": jnp.asarray(rng_.uniform(0.5, 2, 8).astype(np.float32)),
    }
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32, 32, 3))
    lat = vae_encode(params, cfg, x, key=jax.random.PRNGKey(2),
                     sample_posterior=False)
    # normalization changes the latents vs a config without it
    cfg_off = dataclasses.replace(cfg, normalize_latent_channels=False)
    lat_off = vae_encode(params, cfg_off, x, key=jax.random.PRNGKey(2),
                         sample_posterior=False)
    assert not np.allclose(np.asarray(lat), np.asarray(lat_off), atol=1e-4)
    # decode(encode) with normalization == decode(encode) without: the
    # normalize/unnormalize pair cancels for the mode path
    out_on = vae_decode(params, cfg, lat, timestep=jnp.full((1,), 0.1))
    out_off = vae_decode(params, cfg_off, lat_off, timestep=jnp.full((1,), 0.1))
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=1e-4
    )

    # import/export roundtrip carries the buffers
    from avatar_tpu.utils.weight_import import (
        export_vae_state, import_vae_state,
    )

    state = export_vae_state(params, cfg)
    assert "latent_norm_out.running_mean" in state
    params2 = import_vae_state(state, cfg)
    np.testing.assert_allclose(
        np.asarray(params2["latent_norm"]["running_var"]),
        np.asarray(params["latent_norm"]["running_var"]),
    )
