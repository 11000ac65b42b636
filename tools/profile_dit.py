"""Capture an xprof trace of the DiT block scan and print the op profile."""
import glob, os, sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.models.dit import DiTConfig, init_dit, _block_apply
from avatar_tpu.ops.rope import precompute_freqs_cis

impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
cfg = DiTConfig()
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_dit(jax.random.PRNGKey(0), cfg))
b, n = 1, 832
key = jax.random.PRNGKey(1)
inner = cfg.inner_dim
h = jax.random.normal(key, (b, n, inner), dtype=jnp.bfloat16)
grid = jnp.stack(jnp.meshgrid(jnp.arange(13.0), jnp.arange(8.0),
                              jnp.arange(8.0), indexing="ij")
                 ).reshape(3, -1)[None].repeat(b, 0)
freqs = precompute_freqs_cis(grid, dim=inner,
                             theta=cfg.positional_embedding_theta,
                             max_pos=cfg.positional_embedding_max_pos,
                             out_dtype=jnp.bfloat16)
ada = jax.random.normal(key, (b, 1, 6 * inner), dtype=jnp.bfloat16)
eh = jax.random.normal(key, (b, 256, inner), dtype=jnp.bfloat16)
mask = jnp.ones((b, 256))
bp = params["blocks"][0]

@jax.jit
def scan28(bp, h):
    def body(hh, _):
        return _block_apply(bp, hh, cfg, freqs, ada, eh, mask, None, None,
                            attention_impl=impl), None
    return jax.lax.scan(body, h, None, length=28)[0]

import numpy as np
r = scan28(bp, h); np.asarray(r[0, 0, 0])  # warm
logdir = "/tmp/xprof_dit"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        r = scan28(bp, h)
    np.asarray(r[0, 0, 0])

# find xplane file
xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane:", xplane)
