"""Time the 512px/161f VAE decode (bf16 + w8a8) and the I420 postprocess —
splits the perf_512.py `decode_and_fetch` bucket into device decode vs
host fetch.  Latents: [1, 21, 16, 16, 128] -> 161 frames @ 512px."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae, vae_decode
from avatar_tpu.ops.color import rgb_to_yuv420
from avatar_tpu.utils.quantize import quantize_vae_params

vae_cfg = VAEConfig.from_dict({**LTX_VAE_CONFIG, "timestep_conditioning": True})
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_vae(jax.random.PRNGKey(0), vae_cfg))
lat = jax.random.normal(jax.random.PRNGKey(1), (1, 21, 16, 16, 128),
                        jnp.bfloat16)
t0c = jnp.full((1,), 0.05, jnp.float32)


@jax.jit
def fn(p, l):
    img = vae_decode(p, vae_cfg, l, timestep=t0c,
                     per_channel_normalize=True)
    out = rgb_to_yuv420(jnp.clip(img * 0.5 + 0.5, 0, 1))
    return jnp.sum(out.astype(jnp.uint32))


for tag in ("bf16", "w8a8"):
    p = params if tag == "bf16" else jax.jit(quantize_vae_params)(params)
    float(fn(p, lat))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(p, lat))
        ts.append(time.perf_counter() - t0)
    print(f"decode512+i420 {tag}: {min(ts)*1e3:.1f} ms", flush=True)
    del p


# fetch cost: one full I420 frame stack through the tunnel
@jax.jit
def full(p, l):
    img = vae_decode(p, vae_cfg, l, timestep=t0c,
                     per_channel_normalize=True)
    return rgb_to_yuv420(jnp.clip(img * 0.5 + 0.5, 0, 1))


out = full(params, lat)
np.asarray(out)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(full(params, lat))
    ts.append(time.perf_counter() - t0)
print(f"decode+full fetch ({out.nbytes/1e6:.0f} MB): {min(ts)*1e3:.1f} ms",
      flush=True)
