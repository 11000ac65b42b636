"""Decoder fine-tuning (train/decoder.py): the reference's bit-rotted
decoder_train design (config.py:54-59; loss call sites commented out
upstream, training.py:249,366) made functional — step learns, noising
matches the inference decode contract, and the CLI loop exports a drop-in
single-file checkpoint."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.core.config import TrainConfig
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import demo_config, init_vae, vae_decode
from avatar_tpu.train.decoder import (
    decoder_loss,
    init_decoder_trainable,
    make_decoder_train_step,
    merge_decoder_trainable,
)
from avatar_tpu.train.train import make_optimizer

LATENT_CH = 8


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = dataclasses.replace(
        demo_config(latent_channels=LATENT_CH),
        base_channels=32, decoder_base_channels=32,
    )
    params = init_vae(jax.random.PRNGKey(0), cfg)
    params["per_channel_statistics"] = {
        "std_of_means": jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 2, LATENT_CH).astype(np.float32)
        ),
        "mean_of_means": jnp.asarray(
            np.random.default_rng(1).normal(size=LATENT_CH).astype(np.float32)
        ),
    }
    return cfg, params


def _cfg(**kw):
    base = dict(
        checkpoint_path="x", learning_rate=1e-3, batch_size=2,
        train_mode="decoder", decoder_train=True,
        decoder_t_max=0.1, decoder_loss_l1_weight=0.1,
    )
    base.update(kw)
    return TrainConfig(**base)


def _batch(vae_cfg, vae_params, accum=1, b=2, f=2, h=2, w=2):
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    latents = jax.random.normal(ks[0], (accum, b, f, h, w, LATENT_CH))
    # pixel targets with the decoder's true output shape
    sample = vae_decode(
        vae_params, vae_cfg, latents[0],
        timestep=jnp.zeros((b,)) if vae_cfg.timestep_conditioning else None,
        per_channel_normalize=True,
    )
    pixels = jax.random.randint(
        ks[1], (accum,) + sample.shape, 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    return {"latents": latents, "pixels": pixels}


def test_decoder_step_learns(tiny_vae):
    vae_cfg, vae_params = tiny_vae
    cfg = _cfg()
    trainable = init_decoder_trainable(vae_params)
    opt = make_optimizer(cfg)
    opt_state = opt.init(trainable)
    step = make_decoder_train_step(vae_cfg, cfg, opt)
    batch = _batch(vae_cfg, vae_params)
    losses = []
    for _ in range(6):
        trainable, opt_state, metrics = step(
            trainable, opt_state, vae_params, batch, jax.random.PRNGKey(3)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(metrics["decoder_psnr"]))

    # merged export: trained decoder overlaid, base dtype restored
    merged = merge_decoder_trainable(vae_params, trainable)
    assert jax.tree.structure(merged) == jax.tree.structure(vae_params)
    d0 = jax.tree.leaves(vae_params["decoder"])[0]
    assert jax.tree.leaves(merged["decoder"])[0].dtype == d0.dtype
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)).max()),
        merged["decoder"], vae_params["decoder"]))
    assert max(diff) > 0


def test_decoder_loss_noising_matches_inference_contract(tiny_vae):
    """At decoder_t_max -> 0 the loss reduces to L1(decode(latents, t=0),
    pixels): the same clean-latent decode the pipeline performs with
    decode_timestep=0 — the train/infer noising contract."""
    vae_cfg, vae_params = tiny_vae
    cfg = _cfg(decoder_t_max=0.0)
    trainable = init_decoder_trainable(vae_params)
    batch = _batch(vae_cfg, vae_params)
    micro = jax.tree.map(lambda x: x[0], batch)
    loss, metrics = decoder_loss(
        trainable, vae_params, vae_cfg, cfg, micro, jax.random.PRNGKey(0)
    )
    decoded = vae_decode(
        vae_params, vae_cfg, micro["latents"],
        timestep=jnp.zeros((2,)), per_channel_normalize=True,
    )
    pixels = micro["pixels"].astype(jnp.float32) / 127.5 - 1.0
    expect = cfg.decoder_loss_l1_weight * jnp.mean(jnp.abs(decoded - pixels))
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["decoder_l1"]) * cfg.decoder_loss_l1_weight,
        float(loss), rtol=1e-6,
    )


def test_decoder_grad_accumulation(tiny_vae):
    vae_cfg, vae_params = tiny_vae
    cfg = _cfg(gradient_accumulation_steps=2, batch_size=2)
    trainable = init_decoder_trainable(vae_params)
    opt = make_optimizer(cfg)
    step = make_decoder_train_step(vae_cfg, cfg, opt)
    batch = _batch(vae_cfg, vae_params, accum=2)
    t2, _, m = step(
        jax.tree.map(jnp.copy, trainable), opt.init(trainable),
        vae_params, batch, jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(m["loss"]))
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), t2, trainable))
    assert max(diff) > 0


def test_decoder_cli_e2e(tmp_path):
    """CLI decoder loop end-to-end on a synthetic checkpoint: trains,
    exports vae_epoch_1.safetensors, and the export loads + decodes."""
    from avatar_tpu.cli.train import train_loop
    from avatar_tpu.utils.safetensors_io import save_safetensors
    from avatar_tpu.utils.weight_import import (
        export_vae_state, load_checkpoint, save_single_file_checkpoint,
    )

    dit_cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=LATENT_CH,
        out_channels=LATENT_CH, num_layers=1, cross_attention_dim=16,
        caption_channels=32,
    )
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=LATENT_CH),
        base_channels=32, decoder_base_channels=32,
    )
    dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    vae_params = init_vae(jax.random.PRNGKey(1), vae_cfg)
    vae_params["per_channel_statistics"] = {
        "std_of_means": jnp.ones((LATENT_CH,), jnp.float32),
        "mean_of_means": jnp.zeros((LATENT_CH,), jnp.float32),
    }
    ckpt = tmp_path / "ckpt.safetensors"
    save_single_file_checkpoint(
        ckpt, dit_params, dit_cfg,
        vae_state=export_vae_state(vae_params, vae_cfg),
        vae_config=vae_cfg.to_dict(),
    )

    enc = tmp_path / "enc"
    cond = tmp_path / "cond"
    enc.mkdir(); cond.mkdir()
    rng = np.random.default_rng(3)
    sample = vae_decode(
        vae_params, vae_cfg,
        jnp.zeros((1, 2, 2, 2, LATENT_CH)),
        timestep=jnp.zeros((1,)), per_channel_normalize=True,
    )
    for i in range(2):
        stem = f"clip_{i}"
        save_safetensors(
            {"latents": rng.standard_normal(
                (LATENT_CH, 2, 2, 2)).astype(np.float32)},
            enc / f"{stem}.safetensors",
        )
        save_safetensors(
            {"latents": rng.standard_normal(
                (LATENT_CH, 2, 2, 2)).astype(np.float32)},
            cond / f"{stem}.safetensors",
        )
        save_safetensors(
            {"latents": rng.standard_normal(
                (LATENT_CH, 1, 2, 2)).astype(np.float32)},
            cond / f"{stem}_ref.safetensors",
        )
        np.save(enc / f"{stem}_pixels.npy",
                rng.integers(0, 256, sample.shape[1:], dtype=np.uint8))

    out_dir = tmp_path / "run"
    cfg = TrainConfig(
        checkpoint_path=str(ckpt),
        condition_latents_dir=str(cond),
        encoder_latents_dir=str(enc),
        output_dir=str(out_dir),
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        precision="float32", train_mode="decoder", decoder_train=True,
        log_every_n_steps=1, save_every_n_epochs=1, wandb_project=None,
    )
    train_loop(cfg, resume=False)

    export = out_dir / "vae_epoch_1.safetensors"
    assert export.exists()
    _, _, vae_cfg2, vae_params2, _ = load_checkpoint(export)
    out = vae_decode(
        vae_params2, vae_cfg2, jnp.zeros((1, 2, 2, 2, LATENT_CH)),
        timestep=jnp.zeros((1,)), per_channel_normalize=True,
    )
    assert out.shape == sample.shape
    # the exported decoder actually changed vs the original init
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        vae_params2["decoder"], vae_params["decoder"]))
    assert max(diff) > 0

    # partially-preprocessed corpus (one clip missing {stem}_pixels.npy)
    # must fail UP FRONT with the --save_pixels hint, not mid-epoch with a
    # KeyError from collate dropping the mixed 'pixels' key
    (enc / "clip_1_pixels.npy").unlink()
    with pytest.raises(ValueError, match=r"missing for 1/2.*clip_1"):
        train_loop(dataclasses.replace(cfg, output_dir=str(tmp_path / "r2")),
                   resume=False)
