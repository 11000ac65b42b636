"""Trace one w8a8 DiT block-scan at 5376 tokens (512px/161f shape)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from avatar_tpu.models.dit import DiTConfig, init_dit, _block_apply, permute_dit_params_for_split_rope
from avatar_tpu.ops.rope import precompute_freqs_cis, split_freqs
from avatar_tpu.utils.quantize import quantize_dit_params

impl = "auto"
cfg = DiTConfig()
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_dit(jax.random.PRNGKey(0), cfg))
params = jax.jit(lambda p: quantize_dit_params(p, mode="w8a8"))(params)
params = permute_dit_params_for_split_rope(params, cfg, jit_wrap=jax.jit)
b, n = 1, 5376
key = jax.random.PRNGKey(1)
inner = cfg.inner_dim
h = jax.random.normal(key, (b, n, inner), dtype=jnp.bfloat16)
grid = jnp.stack(jnp.meshgrid(jnp.arange(21.0), jnp.arange(16.0), jnp.arange(16.0), indexing="ij")).reshape(3, -1)[None].repeat(b, 0)
freqs = precompute_freqs_cis(grid, dim=inner, theta=cfg.positional_embedding_theta,
                             max_pos=cfg.positional_embedding_max_pos, out_dtype=jnp.bfloat16)
freqs = split_freqs(freqs)
ada = jax.random.normal(key, (b, 1, 6 * inner), dtype=jnp.bfloat16)
eh = jax.random.normal(key, (b, 256, inner), dtype=jnp.bfloat16)
mask = jnp.ones((b, 256))
bp = params["blocks"][0]

@jax.jit
def scan28(bp, h):
    def body(hh, _):
        return _block_apply(bp, hh, cfg, freqs, ada, eh, mask, None, None,
                            attention_impl=impl, rope_split=True), None
    return jax.lax.scan(body, h, None, length=28)[0]

out = scan28(bp, h); float(jnp.sum(out.astype(jnp.float32)))
import time
ts = []
for i in range(3):
    t0 = time.perf_counter(); float(jnp.sum(scan28(bp, h).astype(jnp.float32))); ts.append(time.perf_counter()-t0)
print(f"scan28 (w8a8, 5376 tok): {min(ts)*1e3:.1f} ms", flush=True)
os.system("rm -rf /tmp/xprof512")  # stale runs skew tools/opprof.py totals
with jax.profiler.trace("/tmp/xprof512"):
    float(jnp.sum(scan28(bp, h).astype(jnp.float32)))
print("trace done", flush=True)
