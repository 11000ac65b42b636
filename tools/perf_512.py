"""512px 161-frame single-chip benchmark (SURVEY long-context config).

The BASELINE v5p-64 512px/161f deliverable's single-chip anchor: 5376
tokens/step, blocked bounded-logit flash attention + long-sequence W8A8
Pallas path. Round-2 numbers on v5e: bf16 16.1 f/s, w8a8 18.2 f/s
(10.4 f/s at round-2 start).

Usage: python tools/perf_512.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae
from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

h = w = 512
nf = 161
vae_cfg = VAEConfig.from_dict({**LTX_VAE_CONFIG, "timestep_conditioning": True})
dit_cfg = DiTConfig()
bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)  # noqa: E731
dp = bf16(init_dit(jax.random.PRNGKey(1), dit_cfg))
vp = bf16(init_vae(jax.random.PRNGKey(0), vae_cfg))
embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 4096), jnp.bfloat16)
mask = jnp.ones((1, 256))
ref = jax.random.normal(jax.random.PRNGKey(3), (1, 1, h, w, 3), jnp.bfloat16)
pose = jax.random.normal(jax.random.PRNGKey(4), (1, nf, h, w, 3), jnp.bfloat16)
gp = GenerationParams(height=h, width=w, num_frames=nf - 1, frame_rate=25.0,
                      num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
                      rescaling_scale=1.0, decode_timestep=0.05)
for tag, kw in (("bf16", {}), ("w8a8", dict(quantize_weights="w8a8",
                                            quantize_vae="w8a8"))):
    pipe = LTXVideoPipeline(dit_cfg, dp, vae_cfg, vp, **kw)

    def run(seed):
        return pipe(gp, jax.random.PRNGKey(seed), embeds, mask, ref_image=ref,
                    pose_frames=pose, output_type="yuv420")

    o = run(5)
    np.asarray(o)
    t0 = time.perf_counter()
    outs = []
    for i in range(2):
        oo = run(6 + i)
        oo.copy_to_host_async()
        outs.append(oo)
    for oo in outs:
        np.asarray(oo)
    dt = (time.perf_counter() - t0) / 2
    print(f"{tag}: {nf/dt:.1f} f/s  ({dt:.2f} s/video)", flush=True)
