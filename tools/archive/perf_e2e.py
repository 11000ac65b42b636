"""End-to-end generation time breakdown at the bench operating point."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae
from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline


def main():
    vae_cfg = VAEConfig.from_dict({**LTX_VAE_CONFIG, "timestep_conditioning": True})
    dit_cfg = DiTConfig()

    def bf16(t):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)

    vae_params = bf16(init_vae(jax.random.PRNGKey(0), vae_cfg))
    dit_params = bf16(init_dit(jax.random.PRNGKey(1), dit_cfg))
    pipe = LTXVideoPipeline(dit_cfg, dit_params, vae_cfg, vae_params)

    h = w = 256
    num_frames = 97
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 4096), dtype=jnp.bfloat16)
    mask = jnp.ones((1, 256))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 1, h, w, 3), dtype=jnp.bfloat16)
    pose = jax.random.normal(jax.random.PRNGKey(4), (1, num_frames, h, w, 3), dtype=jnp.bfloat16)
    params = GenerationParams(
        height=h, width=w, num_frames=num_frames - 1, frame_rate=25.0,
        num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )

    def run(seed, output_type="uint8", steps=40):
        p = params
        if steps != 40:
            from dataclasses import replace
            p = replace(params, num_inference_steps=steps)
        out = pipe(p, jax.random.PRNGKey(seed), embeds, mask,
                   ref_image=ref, pose_frames=pose, output_type=output_type)
        return np.asarray(out)

    run(5)  # compile
    run(5, output_type="latent")
    run(5, steps=1)
    run(5, steps=1, output_type="latent")

    def t(fn, n=3):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(6 + i)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    full = t(lambda s: run(s))
    latent = t(lambda s: run(s, output_type="latent"))
    one_latent = t(lambda s: run(s, steps=1, output_type="latent"))
    one_full = t(lambda s: run(s, steps=1))

    # encode-only timing
    k = jax.random.PRNGKey(0)
    np.asarray(pipe.encode_media(pose, k))  # warm
    t0 = time.perf_counter()
    np.asarray(pipe.encode_media(pose, k))
    enc_pose = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(pipe.encode_media(ref, k))
    enc_ref = time.perf_counter() - t0

    step40_39 = (latent - one_latent) / 39
    print(f"full e2e uint8 40 steps: {full*1e3:.0f} ms ({num_frames/full:.1f} f/s)")
    print(f"latent-only 40 steps:   {latent*1e3:.0f} ms")
    print(f"latent-only 1 step:     {one_latent*1e3:.0f} ms")
    print(f"full 1 step:            {one_full*1e3:.0f} ms")
    print(f"-> DiT step time:       {step40_39*1e3:.2f} ms/step")
    print(f"-> decode+fetch (full-latent): {(full-latent)*1e3:.0f} ms")
    print(f"-> fixed overhead (1-step latent minus 1 step): "
          f"{(one_latent-step40_39)*1e3:.0f} ms (encodes+prep+latent fetch)")
    print(f"encode pose (97f):      {enc_pose*1e3:.0f} ms")
    print(f"encode ref (1f):        {enc_ref*1e3:.0f} ms")


if __name__ == "__main__":
    main()
