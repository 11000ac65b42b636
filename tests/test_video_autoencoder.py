"""Legacy VideoAutoencoder: shape contracts, single-frame path, torch conv
oracle for the asymmetric downsample, and state-dict import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.video_autoencoder import (
    VideoAutoencoderConfig,
    import_video_autoencoder_state,
    init_video_autoencoder,
    video_decoder_apply,
    video_encoder_apply,
)

# patch_size_t=1: with patch_size_t>1 the reference's single-frame path
# feeds conv_in the wrong channel count (video_autoencoder.py:317-330);
# shipped legacy configs use temporal patch 1.
CFG = VideoAutoencoderConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_layer="pixel_norm",
    patch_size=2,
    patch_size_t=1,
    latent_log_var="per_channel",
    use_quant_conv=True,
)


def test_encode_decode_shapes():
    params = init_video_autoencoder(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 3))
    moments = video_encoder_apply(params, CFG, x)
    # patch 2 + one downsample (2**0 >= patch? 1 >= 2 no; block 0 has no
    # downsample because 2**0 < patch_size) -> spatial factor = patch only
    assert moments.shape[-1] == 2 * CFG.latent_channels
    latents = moments[..., : CFG.latent_channels]
    recon = video_decoder_apply(params, CFG, latents, upsample_in_time=True)
    assert recon.shape == x.shape

    # single-frame input: no temporal patchify (video_autoencoder.py:317-324)
    img = x[:, :1]
    m_img = video_encoder_apply(params, CFG, img)
    assert m_img.shape[1] == 1
    rec_img = video_decoder_apply(
        params, CFG, m_img[..., : CFG.latent_channels], upsample_in_time=False
    )
    assert rec_img.shape == img.shape


def test_downsample_matches_torch(rng):
    torch = pytest.importorskip("torch")

    from avatar_tpu.models.video_autoencoder import _downsample

    c = 6
    x = rng.standard_normal((1, 5, 8, 8, c)).astype(np.float32)
    w = rng.standard_normal((c, c, 3, 3, 3)).astype(np.float32) * 0.2
    b = rng.standard_normal((c,)).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    xt = torch.nn.functional.pad(xt, (0, 1, 0, 1, 0, 1))  # (W,H,D) last-dim-first
    ref = torch.nn.functional.conv3d(
        xt, torch.from_numpy(w), torch.from_numpy(b), stride=2
    ).permute(0, 2, 3, 4, 1).numpy()

    p = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)), "bias": jnp.asarray(b)}
    out = _downsample(p, jnp.asarray(x), in_time=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_state_dict_roundtrip_import():
    """Build a torch-layout state dict from our params (inverse transforms)
    and check the importer reproduces identical outputs."""
    params = init_video_autoencoder(jax.random.PRNGKey(2), CFG)

    state = {}

    def put_conv(key, p):
        state[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)
        if "bias" in p:
            state[f"{key}.bias"] = np.asarray(p["bias"])

    def put_lin(key, p):
        state[f"{key}.weight"] = np.asarray(p["kernel"]).T[:, :, None, None, None]
        if "bias" in p:
            state[f"{key}.bias"] = np.asarray(p["bias"])

    def put_resnet(prefix, p):
        for conv in ("conv1", "conv2"):
            put_conv(f"{prefix}.{conv}", p[conv])
        if "conv_shortcut" in p:
            put_lin(f"{prefix}.conv_shortcut", p["conv_shortcut"])

    enc, dec = params["encoder"], params["decoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    put_conv("encoder.conv_out", enc["conv_out"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, rb in enumerate(block["res_blocks"]):
            put_resnet(f"encoder.down_blocks.{i}.res_blocks.{j}", rb)
        if "downsample" in block:
            put_conv(f"encoder.down_blocks.{i}.downsample.conv", block["downsample"])
    for j, rb in enumerate(enc["mid_block"]):
        put_resnet(f"encoder.mid_block.res_blocks.{j}", rb)
    put_conv("decoder.conv_in", dec["conv_in"])
    put_conv("decoder.conv_out", dec["conv_out"])
    for j, rb in enumerate(dec["mid_block"]):
        put_resnet(f"decoder.mid_block.res_blocks.{j}", rb)
    for i, block in enumerate(dec["up_blocks"]):
        for j, rb in enumerate(block["res_blocks"]):
            put_resnet(f"decoder.up_blocks.{i}.res_blocks.{j}", rb)
        if "upsample" in block:
            put_conv(f"decoder.up_blocks.{i}.upsample.conv", block["upsample"])
    put_lin("quant_conv", params["quant_conv"])
    put_lin("post_quant_conv", params["post_quant_conv"])

    params2 = import_video_autoencoder_state(state, CFG)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 3))
    a = video_encoder_apply(params, CFG, x)
    b = video_encoder_apply(params2, CFG, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
