"""Training: jit-compiled LoRA / full fine-tuning of the avatar DiT.

Re-design of `/root/reference/ltx_video/training.py:42-399`:

- ``train_step`` is ONE jitted function per macro-batch: log-normal timestep
  sampling with quantile clamping (training.py:124-132), rectified-flow
  noising + velocity-MSE target, the avatar ref/pose lerp, LoRA deltas, and
  gradient accumulation as an inner ``lax.scan`` over micro-batches — no
  Python-side ``loss.backward()`` bookkeeping.
- Only the trainable subtree is differentiated (LoRA + caption_projection in
  "lora_audio" mode; the reference's named-parameter filter in "full" mode),
  so frozen 2B weights never get gradient buffers.
- Parallelism comes from sharding annotations (see avatar_tpu.parallel.mesh)
  instead of DeepSpeed: batch over ('data','fsdp'), params per
  TrainConfig.sharding_mode.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from avatar_tpu.core.config import TrainConfig
from avatar_tpu.diffusion.rf import add_noise, velocity_target
from avatar_tpu.models.dit import DiTConfig, avatar_condition_tokens, dit_apply
from avatar_tpu.models.patchifier import patchify
from avatar_tpu.train.lora import init_lora, lora_scale

FULL_TRAINABLE_KEYS = (
    # training.py:78-90 named-parameter filter
    "proj_out",
    "scale_shift_table",
    "adaln_single",
    "caption_projection",
    "attn1",
    "attn2",
)


# ---------------------------------------------------------------------------
# Trainable-subtree partitioning
# ---------------------------------------------------------------------------


def split_full_trainable(params: dict, keys=FULL_TRAINABLE_KEYS):
    """Extract the trainable subtree for "full" mode.

    Mirrors the reference's substring filter over *torch* parameter names
    (training.py:78-90): top-level proj_out / scale_shift_table /
    adaln_single / caption_projection plus every block's attn1 / attn2 /
    scale_shift_table — NOT the feed-forward (its torch names "ff.net.*"
    match none of the keys) and not patchify_proj.
    """
    top = {
        k: params[k]
        for k in ("proj_out", "scale_shift_table", "adaln_single",
                  "caption_projection")
        if k in params
    }
    blocks = []
    for block in params["blocks"]:
        blocks.append(
            {
                k: block[k]
                for k in ("attn1", "attn2", "attn2_norm", "scale_shift_table")
                if k in block
            }
        )
    top["blocks"] = blocks
    return top


def overlay_params(params, trainable):
    """Recursively overlay trainable leaves onto the base params tree."""
    if trainable is None:
        return params
    if isinstance(trainable, dict):
        out = dict(params)
        for k, v in trainable.items():
            out[k] = overlay_params(params.get(k), v) if isinstance(
                v, (dict, list)
            ) else v
        return out
    if isinstance(trainable, list):
        return [overlay_params(p, t) for p, t in zip(params, trainable)]
    return trainable


# ---------------------------------------------------------------------------
# Timestep sampling (training.py:124-136)
# ---------------------------------------------------------------------------


def sample_rf_timesteps(
    key: jax.Array,
    batch_size: int,
    mu: float,
    sigma: float,
    q_min: float,
    q_max: float,
) -> jnp.ndarray:
    """LogNormal(mu, sigma) -> t = z / (1 + z), clamped to batch quantiles."""
    z = jnp.exp(mu + sigma * jax.random.normal(key, (batch_size,)))
    t = z / (1.0 + z)
    t_low = jnp.quantile(t, q_min)
    t_high = jnp.quantile(t, q_max)
    return jnp.clip(t, t_low, t_high)


def shift_timesteps_device(
    t: jnp.ndarray,
    n_tokens: int,
    shifting: Optional[str],
    target_shift_terminal: Optional[float],
    base_resolution: int,
) -> jnp.ndarray:
    """Device-side resolution-dependent shift (rf.py:49-149 semantics; the
    token count is static so this is pure elementwise math)."""
    if shifting == "SD3":
        m = (2.05 - 0.95) / (4096 - 1024)
        b = 0.95 - m * 1024
        mu = m * n_tokens + b
        shifted = math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0))
        if target_shift_terminal is not None:
            one_minus = 1.0 - shifted
            scale = one_minus[-1] / (1.0 - target_shift_terminal)
            shifted = 1.0 - one_minus / scale
        return shifted
    if shifting == "SimpleDiffusion":
        snr = (t / (1.0 - t)) ** 2
        shift_snr = jnp.log(snr) + 2.0 * math.log(n_tokens / base_resolution)
        return jax.nn.sigmoid(0.5 * shift_snr)
    return t


# ---------------------------------------------------------------------------
# Loss + train step
# ---------------------------------------------------------------------------


def velocity_loss(
    trainable: dict,
    dit_params: dict,
    dit_cfg: DiTConfig,
    cfg: TrainConfig,
    batch: Dict[str, jnp.ndarray],
    prompt_embeds: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    key: jax.Array,
    train_mode: str,
    attention_impl: str = "auto",
    remat=False,  # False | "full" | "dots"
    rope_split: bool = False,
    pp_mesh=None,  # GPipe: blocks stacked + stage-sharded (sharding_mode "pp")
    sp_mesh=None,  # context parallel: token axis sharded (sharding_mode "sp")
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """training.py:94-166 as a pure function over (trainable, batch).

    ``rope_split``: dit_params are in the split-RoPE column layout
    (models.dit.permute_dit_params_for_split_rope) — the training forward
    then takes the RoPE-fused attention kernel path and the backward
    avoids the interleaved rotation's relayouts. Safe for lora_audio (the
    permutation touches only frozen attn1 q/k; LoRA targets attn2 and
    caption_projection is untouched), so the exported checkpoint stays in
    canonical layout."""
    if train_mode == "lora_audio":
        lora = trainable["lora"]
        params = overlay_params(
            dit_params, {"caption_projection": trainable["caption_projection"]}
        )
        scale = lora_scale(cfg.lora_rank, cfg.lora_alpha)
    else:
        lora = None
        params = overlay_params(dit_params, trainable)
        scale = 1.0

    model_dtype = dit_params["patchify_proj"]["kernel"].dtype
    latents = batch["latents"].astype(model_dtype)  # [B, F, H, W, C]
    ref = batch["ref_image_latents"].astype(model_dtype)  # [B, 1, H, W, C]
    pose = batch["pose_latents"].astype(model_dtype)  # [B, F, H, W, C]
    b = latents.shape[0]

    tokens, coords = patchify(latents)  # indices_grid = latent coords
    n_tokens = tokens.shape[1]

    k_t, k_noise = jax.random.split(key)
    t = sample_rf_timesteps(
        k_t, b, cfg.rf_log_normal_mu or 0.0, cfg.rf_log_normal_sigma or 1.0,
        cfg.rf_quantile_min, cfg.rf_quantile_max,
    )
    t = shift_timesteps_device(
        t, n_tokens, cfg.rf_shifting, cfg.rf_target_shift_terminal,
        cfg.rf_base_resolution,
    )

    tokens_f32 = tokens.astype(jnp.float32)
    noise = jax.random.normal(k_noise, tokens.shape, dtype=jnp.float32)
    noisy = add_noise(tokens_f32, noise, t).astype(model_dtype)
    v_target = velocity_target(tokens_f32, noise, t)

    cond = avatar_condition_tokens(noisy, ref, pose)
    if "audio_latents" in batch:
        # audio-conditioned training: FaceFormer features lifted into the
        # caption input space (the reference's bit-rotted audio design,
        # training_deepspeed.py:144-157, made to work — see
        # faceformer.audio_features_to_caption_embeds)
        from avatar_tpu.models.faceformer import audio_features_to_caption_embeds

        embeds = audio_features_to_caption_embeds(
            batch["audio_latents"], dit_cfg.caption_channels
        ).astype(model_dtype)
        mask = batch["audio_mask"]
    else:
        embeds = jnp.broadcast_to(
            prompt_embeds, (b,) + prompt_embeds.shape[1:]
        ).astype(model_dtype)
        mask = jnp.broadcast_to(prompt_mask, (b,) + prompt_mask.shape[1:])

    if pp_mesh is not None:
        # Pipeline-parallel denoiser: params["blocks"] / lora["blocks"] are
        # stacked [L, ...] and stage-sharded over 'pp'; microbatches stream
        # through the stages (parallel/pipeline.py). lora_audio only — the
        # "full" trainable split assumes per-block lists.
        assert train_mode == "lora_audio", "sharding_mode=pp needs lora_audio"
        from avatar_tpu.parallel.pipeline import dit_apply_pp

        out = dit_apply_pp(
            params, dit_cfg, cond, coords, t.astype(model_dtype), embeds,
            mask, mesh=pp_mesh,
            num_microbatches=cfg.pp_microbatches or None,
            data_axis="data" if pp_mesh.shape.get("data", 1) > 1 else None,
            attention_impl=attention_impl, lora=lora, lora_scale=scale,
            remat=remat, rope_split=rope_split,
        )
    elif sp_mesh is not None:
        # Context-parallel denoiser: activations token-sharded over 'sp'
        # (Ulysses all-to-all or ring attention per cfg.sp_impl), batch
        # optionally sharded over a 'data' axis — the long-context training
        # machinery (512px·161f sequences past one chip's HBM).  Params and
        # trainable stay replicated; the loss vjp psums grads over the mesh.
        from avatar_tpu.parallel.sequence import dit_apply_sp

        out = dit_apply_sp(
            params, dit_cfg, cond, coords, t.astype(model_dtype), embeds,
            mask, mesh=sp_mesh, sp_impl=getattr(cfg, "sp_impl", "ulysses"),
            data_axis="data" if sp_mesh.shape.get("data", 1) > 1 else None,
            attention_impl=attention_impl, lora=lora, lora_scale=scale,
            remat=remat, rope_split=rope_split,
        )
    else:
        out = dit_apply(
            params, dit_cfg, cond, coords, t.astype(model_dtype), embeds,
            mask, attention_impl=attention_impl, lora=lora, lora_scale=scale,
            remat=remat, rope_split=rope_split,
        )

    out = out.astype(jnp.float32)
    std_target = jnp.std(v_target, ddof=1)
    mse = jnp.mean((out - v_target) ** 2)
    loss = cfg.transformer_loss_weight * mse
    rel_mse = loss / (std_target**2 + 1e-12)
    nrmse = jnp.sqrt(loss) / (std_target + 1e-12)
    metrics = {
        "loss": loss,
        "transformer_mse": mse,
        "rel_mse": rel_mse,
        "nrmse": nrmse,
    }
    return loss, metrics


class EmaState(NamedTuple):
    """EMA of the trainable params, carried inside the optimizer state so
    orbax checkpointing and ZeRO opt-state sharding apply to it for free."""

    ema: Any
    count: jnp.ndarray


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Last link of the optimizer chain: passes updates through unchanged
    and tracks ``ema = d*ema + (1-d)*(params + updates)`` with the standard
    bias-corrected warmup ``d = min(decay, (1+t)/(10+t))``."""

    def init_fn(params):
        # explicit copy: the step donates trainable AND opt_state — aliased
        # buffers at init would be donated twice
        ema = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return EmaState(ema=ema, count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params requires params")
        new_params = optax.apply_updates(params, updates)
        count = state.count + 1
        d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
        ema = jax.tree.map(
            lambda e, p: (
                d * e.astype(jnp.float32) + (1.0 - d) * p.astype(jnp.float32)
            ).astype(e.dtype),
            state.ema,
            new_params,
        )
        return updates, EmaState(ema=ema, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(opt_state):
    """Extract the EMA trainable tree from a chained optimizer state
    (None when the optimizer was built without ema_decay)."""
    for leaf in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaState)
    ):
        if isinstance(leaf, EmaState):
            return leaf.ema
    return None


def make_lr_schedule(cfg: TrainConfig, total_steps: Optional[int] = None):
    """Learning rate as a float (constant, no warmup) or an optax schedule.

    ``total_steps`` (CLI: num_epochs x steps-per-epoch) backs
    cfg.lr_total_steps; cosine/linear decay requires one of them."""
    base = cfg.learning_rate or 1e-4
    kind = (cfg.lr_schedule or "constant").lower()
    warmup = max(cfg.lr_warmup_steps, 0)
    total = cfg.lr_total_steps or total_steps or 0
    if kind == "constant" and warmup == 0:
        return base
    if kind not in ("constant", "cosine", "linear"):
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if kind != "constant" and total <= warmup:
        raise ValueError(
            f"lr_schedule={kind!r} needs lr_total_steps > lr_warmup_steps "
            f"(got total={total}, warmup={warmup})"
        )
    decay_steps = max(total - warmup, 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / warmup if warmup else 1.0
        warm = jnp.minimum(warm, 1.0)
        progress = jnp.clip((s - warmup) / decay_steps, 0.0, 1.0)
        if kind == "cosine":
            factor = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        elif kind == "linear":
            factor = 1.0 - progress
        else:
            factor = 1.0
        return base * warm * factor

    return schedule


def make_optimizer(
    cfg: TrainConfig, total_steps: Optional[int] = None
) -> optax.GradientTransformation:
    # torch.optim.AdamW defaults (training.py:271): betas (0.9, 0.999),
    # eps 1e-8, weight_decay 0.01.  cfg.optimizer / optimizer_moment_dtype
    # trade optimizer-state HBM for speed/batch headroom (see TrainConfig).
    # Optional production extras (all off by default — reference parity):
    # global-norm clipping, warmup/cosine/linear LR schedule, param EMA.
    lr = make_lr_schedule(cfg, total_steps)
    if cfg.optimizer == "adafactor":
        base = optax.adafactor(lr)
    elif cfg.optimizer == "adamw":
        mu_dtype = None
        if cfg.optimizer_moment_dtype in ("bfloat16", "bf16"):
            mu_dtype = jnp.bfloat16
        base = optax.adamw(
            lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
            mu_dtype=mu_dtype,
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    links = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        links.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    links.append(base)
    if cfg.ema_decay and cfg.ema_decay > 0:
        if not 0.0 < cfg.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1): {cfg.ema_decay}")
        links.append(ema_of_params(cfg.ema_decay))
    return optax.chain(*links) if len(links) > 1 else base


def init_trainable(
    key: jax.Array, dit_params: dict, dit_cfg: DiTConfig, cfg: TrainConfig
) -> dict:
    if cfg.train_mode == "lora_audio":
        return {
            "lora": init_lora(key, dit_cfg, cfg.lora_rank),
            "caption_projection": jax.tree.map(
                lambda x: x.astype(jnp.float32),
                dit_params["caption_projection"],
            ),
        }
    trainable = split_full_trainable(dit_params)
    return jax.tree.map(lambda x: x.astype(jnp.float32), trainable)


def make_train_step(
    dit_cfg: DiTConfig,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    attention_impl: str = "auto",
    trainable_sharding=None,
    opt_state_sharding=None,
    rope_split: bool = False,
    pp_mesh=None,
    sp_mesh=None,
) -> Callable:
    """Build the jitted macro-batch step.

    batch arrays are shaped [accum, micro_b, ...]; gradient accumulation is
    a lax.scan over the leading axis with f32 grad accumulators
    (training.py:199-207 semantics: mean over accumulation steps).

    ``trainable_sharding``/``opt_state_sharding``: NamedSharding pytrees
    pinning the step's *outputs* — without them XLA may migrate params to a
    different layout than the mode intends (e.g. ZeRO-2 params must come
    back replicated, not fsdp-sharded) and the layout drifts from step 1 on.
    """
    accum = cfg.gradient_accumulation_steps
    # False | "full" | "dots" — see TrainConfig.remat_policy
    remat = (
        (getattr(cfg, "remat_policy", "full") or "full")
        if cfg.gradient_checkpointing else False
    )

    def step(trainable, opt_state, dit_params, batch, prompt_embeds,
             prompt_mask, key):
        def grads_for(micro, k):
            loss_fn = functools.partial(
                velocity_loss,
                dit_params=dit_params, dit_cfg=dit_cfg, cfg=cfg,
                batch=micro, prompt_embeds=prompt_embeds,
                prompt_mask=prompt_mask, key=k,
                train_mode=cfg.train_mode, attention_impl=attention_impl,
                remat=remat, rope_split=rope_split, pp_mesh=pp_mesh,
                sp_mesh=sp_mesh,
            )
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            return grads, metrics

        if accum > 1:
            def scan_body(carry, inp):
                g_acc, i = carry
                micro = inp
                g, m = grads_for(micro, jax.random.fold_in(key, i))
                g_acc = jax.tree.map(lambda a, b: a + b, g_acc, g)
                return (g_acc, i + 1), m

            zero = jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), trainable
            )
            (grads, _), metrics = jax.lax.scan(
                scan_body, (zero, 0), batch
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
        else:
            micro = jax.tree.map(lambda x: x[0], batch)
            grads, metrics = grads_for(micro, key)

        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    out_shardings = None
    if trainable_sharding is not None and opt_state_sharding is not None:
        out_shardings = (trainable_sharding, opt_state_sharding, None)
    return jax.jit(step, donate_argnums=(0, 1), out_shardings=out_shardings)


def validate_step_fn(
    dit_cfg: DiTConfig, cfg: TrainConfig, attention_impl: str = "auto",
    rope_split: bool = False,
    pp_mesh=None,
    sp_mesh=None,
) -> Callable:
    """validation.py:14-95: same noising/velocity MSE without gradients."""

    @jax.jit
    def step(trainable, dit_params, batch, prompt_embeds, prompt_mask, key):
        _, metrics = velocity_loss(
            trainable, dit_params, dit_cfg, cfg, batch,
            prompt_embeds, prompt_mask, key,
            train_mode=cfg.train_mode, attention_impl=attention_impl,
            rope_split=rope_split, pp_mesh=pp_mesh, sp_mesh=sp_mesh,
        )
        return metrics

    return step
