"""Measure the "full"-mode train step across remat policies on the real chip.

VERDICT r2 item 5: full mode (0.97B trainable subset, f32 AdamW masters)
fits a single v5e only with rematerialization; round 2 measured 2.7 s/step
with all-or-nothing per-block remat. This sweeps remat x policy:

    off    — no checkpointing (OOMs at the full operating point; try anyway)
    full   — jax.checkpoint(block) saving only block boundaries
    dots   — dots_with_no_batch_dims_saveable: weight matmuls saved,
             attention/elementwise recomputed (reference gradient
             checkpointing is per-block, transformer3d.py:503-534 — "dots"
             has no reference counterpart)

Operating point = configs/train-avatars.yaml:17-37 (batch 8, 57f@320x192
latents -> 480 tokens).  Usage: python tools/profile_full_train.py [b]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.core.config import TrainConfig
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.train.train import (init_trainable, make_optimizer,
                                    make_train_step)

b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
dit_cfg = DiTConfig()
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_dit(jax.random.PRNGKey(0), dit_cfg))

f, h, w, c = 8, 6, 10, 128
batch = {
    "latents": jax.random.normal(jax.random.PRNGKey(2), (1, b, f, h, w, c),
                                 jnp.bfloat16),
    "ref_image_latents": jax.random.normal(jax.random.PRNGKey(5),
                                           (1, b, 1, h, w, c), jnp.bfloat16),
    "pose_latents": jax.random.normal(jax.random.PRNGKey(6),
                                      (1, b, f, h, w, c), jnp.bfloat16),
}
embeds = jax.random.normal(jax.random.PRNGKey(4), (b, 256, 4096), jnp.bfloat16)
mask = jnp.ones((b, 256))

ROWS = (
    # (gradient_checkpointing, remat_policy, optimizer)
    (True, "full", "adamw"),      # round-3 baseline: 563 ms
    (True, "dots", "adafactor"),  # factored 2nd moment frees ~7.8 GB ->
    (True, "full", "adafactor"),  #   does "dots" now fit / pay off?
    (False, "full", "adafactor"),
)
for ckpt, policy, optname in ROWS:
    cfg = TrainConfig(checkpoint_path="", train_mode="full",
                      learning_rate=1e-4, gradient_accumulation_steps=1,
                      gradient_checkpointing=ckpt, remat_policy=policy,
                      optimizer=optname)
    tag = f"remat={'off' if not ckpt else policy} opt={optname}"
    try:
        trainable = init_trainable(jax.random.PRNGKey(1), params, dit_cfg, cfg)
        opt = make_optimizer(cfg)
        opt_state = opt.init(trainable)
        step = make_train_step(dit_cfg, cfg, opt)

        def run(seed, trainable=None, opt_state=None, _step=step):
            t, o, m = _step(trainable, opt_state, params, batch, embeds,
                            mask, jax.random.PRNGKey(seed))
            return t, o, m

        t0 = time.perf_counter()
        trainable, opt_state, m = run(0, trainable, opt_state)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            trainable, opt_state, m = run(1 + i, trainable, opt_state)
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: step {min(ts)*1e3:.0f} ms (compile {compile_s:.0f} s, "
              f"loss {float(m['loss']):.4f})", flush=True)
    except Exception as e:  # OOM expected for remat=off at b=8
        print(f"{tag}: failed — {str(e)[:140]}", flush=True)
    finally:
        # drop the f32 AdamW masters (~11.6 GB at 0.97B trainable) even on
        # failure — a leaked opt_state OOMs every config after the first
        trainable = opt_state = step = run = m = None
        import gc

        gc.collect()
