"""xprof the VAE decode at bench shapes."""
import os, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae, vae_decode, vae_encode

mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
vae_cfg = VAEConfig.from_dict({**LTX_VAE_CONFIG, "timestep_conditioning": True})
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vae(jax.random.PRNGKey(0), vae_cfg))
if mode == "decode":
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 13, 8, 8, 128), jnp.bfloat16)
    t0 = jnp.full((1,), 0.05, jnp.float32)
    @jax.jit
    def fn(p, l):
        img = vae_decode(p, vae_cfg, l, timestep=t0, per_channel_normalize=True)
        return jnp.sum(img.astype(jnp.float32))
    arg = lat
else:
    media = jax.random.normal(jax.random.PRNGKey(1), (1, 97, 256, 256, 3), jnp.bfloat16)
    @jax.jit
    def fn(p, m):
        lat = vae_encode(p, vae_cfg, m, key=jax.random.PRNGKey(0),
                         sample_posterior=False, per_channel_normalize=True)
        return jnp.sum(lat.astype(jnp.float32))
    arg = media
float(fn(params, arg))
t0_ = time.perf_counter(); float(fn(params, arg)); dt = time.perf_counter() - t0_
print(f"{mode}: {dt*1e3:.1f} ms")
logdir = f"/tmp/xprof_vae_{mode}"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    float(fn(params, arg))
print("done")
