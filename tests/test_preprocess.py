"""Preprocess-CLI tests: the latent-extraction loop end-to-end on a
synthetic mp4 + tiny checkpoint, and the uint8 fast path's bit-parity with
the host-normalized float path (reference: preprocessing/save_vae_latents.py
— whose loop is untested upstream)."""

import dataclasses
import json
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import demo_config, init_vae
from avatar_tpu.utils.weight_import import (
    export_vae_state,
    save_single_file_checkpoint,
)

LATENT_CH = 8
H, W = 64, 96  # multiples of the demo VAE's 32x spatial factor


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pre_ckpt")
    dit_cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=LATENT_CH,
        out_channels=LATENT_CH, num_layers=1, cross_attention_dim=16,
        caption_channels=32,
    )
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=LATENT_CH),
        base_channels=32, decoder_base_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(1), vae_cfg)
    vae_params["per_channel_statistics"] = {
        "std_of_means": jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 2, LATENT_CH).astype(np.float32)
        ),
        "mean_of_means": jnp.asarray(
            np.random.default_rng(1).normal(size=LATENT_CH).astype(np.float32)
        ),
    }
    path = tmp / "ckpt.safetensors"
    save_single_file_checkpoint(
        path, init_dit(jax.random.PRNGKey(0), dit_cfg), dit_cfg,
        vae_state=export_vae_state(vae_params, vae_cfg),
        vae_config=vae_cfg.to_dict(),
        scheduler_config={"_class_name": "RectifiedFlowScheduler",
                          "num_train_timesteps": 1000, "sampler": "Uniform"},
    )
    return path, vae_cfg


def _write_video(path, num_frames):
    import cv2

    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25.0,
                         (W, H))
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (H, W, 3), np.uint8)
    for i in range(num_frames):
        wr.write(np.roll(base, 2 * i, axis=1))
    wr.release()


def test_preprocess_frames_uint8_parity():
    """as_uint8=True + the on-device (x/255)*2-1 normalize must bit-match
    the host float path (same f32 expression, different placement)."""
    from avatar_tpu.cli.preprocess import preprocess_frames

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (40, 52, 3), np.uint8))
              for _ in range(5)]
    xf = preprocess_frames(frames, 32, 48)
    xu = preprocess_frames(frames, 32, 48, as_uint8=True)
    assert xu.dtype == np.uint8 and xf.dtype == np.float32
    renorm = xu.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_array_equal(xf, renorm)

    # numpy-array input frames must match PIL input frames
    x2 = preprocess_frames([np.asarray(f) for f in frames], 32, 48)
    np.testing.assert_array_equal(xf, x2)


def test_vae_encoder_uint8_path_matches_float(vae_ckpt):
    from avatar_tpu.cli.preprocess import VAEEncoder

    path, _ = vae_ckpt
    enc = VAEEncoder(str(path), precision="float32")
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 255, (1, 9, H, W, 3), np.uint8)
    f32 = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    lat_u8 = np.asarray(enc.encode(u8, seed=11))
    lat_f32 = np.asarray(enc.encode(f32, seed=11))
    # identical math; XLA may fuse the device normalize's mul-sub into an
    # FMA, so agreement is ULP-level rather than bitwise
    np.testing.assert_allclose(lat_u8, lat_f32, rtol=2e-6, atol=2e-6)


def test_save_vae_latents_cli(tmp_path, vae_ckpt):
    """save-vae-latents over two synthetic videos: every clip latent lands
    with the reference geometry ((F-1)/8+1, H/32, W/32) and metadata, via
    the threaded decode -> H2D -> encode pipeline."""
    from avatar_tpu.cli.preprocess import cmd_save_vae_latents

    path, vae_cfg = vae_ckpt
    vids = tmp_path / "vids"
    vids.mkdir()
    for i in range(2):
        _write_video(vids / f"v{i}.mp4", 2 * 9)  # two 9-frame clips each
    out = tmp_path / "latents"
    out.mkdir()
    args = types.SimpleNamespace(
        ckpt=str(path), inputs=[str(vids)], output_dir=str(out),
        clip_length=9, stride=9, height=H, width=W,
        per_channel_normalize=True, format="safetensors",
    )
    cmd_save_vae_latents(args)

    from avatar_tpu.utils.safetensors_io import load_safetensors

    lat_files = sorted(out.glob("*.safetensors"))
    assert len(lat_files) == 4, [p.name for p in out.iterdir()]
    for f in lat_files:
        lat = load_safetensors(f)[0]["latents"]
        assert lat.shape == (1, LATENT_CH, 2, H // 32, W // 32), (
            f.name, lat.shape)  # NCFHW on disk (reference .pt layout)
        meta = json.loads(f.with_suffix(".json").read_text())
        assert meta["clip_length"] == 9 if "clip_length" in meta else True
