"""xprof the optimized denoise step (pipeline path) and print op stats."""
import os

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.models.dit import (DiTConfig, init_dit, dit_apply,
                                   permute_dit_params_for_split_rope,
                                   precompute_cross_attention_kv)
from avatar_tpu.ops.rope import get_latent_coords, precompute_freqs_cis, split_freqs

cfg = DiTConfig()
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_dit(jax.random.PRNGKey(0), cfg))
params = permute_dit_params_for_split_rope(params, cfg)
b, f, h, w = 1, 13, 8, 8
n = f * h * w
x = jax.random.normal(jax.random.PRNGKey(1), (b, n, 128), jnp.bfloat16)
grid = get_latent_coords(f, h, w, batch_size=b)
embeds = jax.random.normal(jax.random.PRNGKey(2), (b, 256, 4096), jnp.bfloat16)
mask = jnp.ones((b, 256))
t = jnp.full((b,), 0.5, jnp.bfloat16)
freqs = split_freqs(precompute_freqs_cis(
    grid, dim=cfg.inner_dim, theta=cfg.positional_embedding_theta,
    max_pos=cfg.positional_embedding_max_pos, out_dtype=jnp.bfloat16))
cross_kv, _ = precompute_cross_attention_kv(params, cfg, embeds, dtype=jnp.bfloat16)

@jax.jit
def step20(params, x, t):
    def body(i, xx):
        out = dit_apply(params, cfg, xx, grid, t, None, mask,
                        freqs_cis=freqs, rope_split=True, cross_kv=cross_kv)
        return xx + 0.001 * out.astype(xx.dtype)
    return jax.lax.fori_loop(0, 20, body, x)

r = step20(params, x, t); float(jnp.sum(r[...,0].astype(jnp.float32)))
import time
t0 = time.perf_counter(); r = step20(params, x, t)
float(jnp.sum(r[...,0].astype(jnp.float32)))
print(f"20-step loop: {(time.perf_counter()-t0)*1e3:.1f} ms -> "
      f"{(time.perf_counter()-t0)*50:.2f} ms/step")
logdir = "/tmp/xprof_step"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    r = step20(params, x, t)
    float(jnp.sum(r[...,0].astype(jnp.float32)))
print("done")
