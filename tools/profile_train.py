"""xprof the LoRA train step at the BASELINE operating point on the real chip.

Operating point (BASELINE.md / configs/train-avatars.yaml:17-37): batch 8,
57-frame clips at 320x192 -> latents [8, 8, 6, 10, 128] = 480 tokens,
LoRA r=32 on attn2 + caption_projection, bf16 activations, accum 1.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.core.config import TrainConfig
import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--rope-split", action="store_true")
_ap.add_argument("--batch", type=int, default=8)
_ap.add_argument("logdir", nargs="?", default="/tmp/xprof_train")
_args = _ap.parse_args()
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.train.train import (init_trainable, make_optimizer,
                                    make_train_step)

dit_cfg = DiTConfig()
cfg = TrainConfig(checkpoint_path="", train_mode="lora_audio",
                  lora_rank=32, lora_alpha=32, learning_rate=1e-4,
                  gradient_accumulation_steps=1,
                  gradient_checkpointing=False)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_dit(jax.random.PRNGKey(0), dit_cfg))
trainable = init_trainable(jax.random.PRNGKey(1), params, dit_cfg, cfg)
opt = make_optimizer(cfg)
opt_state = opt.init(trainable)
if _args.rope_split:
    from avatar_tpu.models.dit import permute_dit_params_for_split_rope
    params = permute_dit_params_for_split_rope(params, dit_cfg)
step = make_train_step(dit_cfg, cfg, opt, rope_split=_args.rope_split)

b, f, h, w, c = _args.batch, 8, 6, 10, 128
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

def run(seed):
    global trainable, opt_state
    trainable, opt_state, metrics = step(
        trainable, opt_state, params, batch, embeds, mask,
        jax.random.PRNGKey(seed))
    return metrics

m = run(0)
print("metrics:", {k: float(v) for k, v in m.items()})
ts = []
for i in range(6):
    t0 = time.perf_counter()
    m = run(1 + i)
    float(jax.tree.leaves(m)[0])
    ts.append(time.perf_counter() - t0)
print("step ms:", [f"{t*1e3:.0f}" for t in ts])

# steady state as the real loop runs it (cli/train.py drain_metrics): fetch
# step i-1's metrics after dispatching step i, so the fetch overlaps device
# execution.  This is the number to compare against device time.
N = 10
pending = None
t0 = time.perf_counter()
for i in range(N):
    m = run(20 + i)
    if pending is not None:
        float(jax.tree.leaves(pending)[0])
    pending = m
float(jax.tree.leaves(pending)[0])
dt = (time.perf_counter() - t0) / N
print(f"pipelined wall ms/step (deferred metrics, {N} steps): {dt*1e3:.0f}")

logdir = _args.logdir
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    m = run(99)
    float(jax.tree.leaves(m)[0])
print("trace ->", logdir)
