"""Benchmark: avatar video generation throughput on one TPU chip.

Workload = BASELINE config 3 / the north-star metric: image+text -> 97-frame
256px talking-avatar video with the 2B DiT (28L x 2048d) + 128-ch causal
video VAE, 40 rectified-flow steps at the avatar operating point
(guidance 1.0, stg 0.0, decode_timestep 0.05, bf16 — reference
configs/inference-avatars.yaml:4-13).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the baseline
here is an *estimated* A100 throughput of the torch reference on the same
workload (~17.5 frames/s: ~3.2 TFLOP/forward x 40 steps + VAE decode at
eager-torch MFU on A100; see BASELINE.md). The north star is >=2x A100.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae
from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

A100_REFERENCE_FPS_ESTIMATE = 17.5


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
    embeds = jax.random.normal(
        jax.random.PRNGKey(2), (1, 256, 4096), dtype=jnp.bfloat16
    )
    mask = jnp.ones((1, 256))
    ref = jax.random.normal(
        jax.random.PRNGKey(3), (1, 1, h, w, 3), dtype=jnp.bfloat16
    )
    pose = jax.random.normal(
        jax.random.PRNGKey(4), (1, num_frames, h, w, 3), dtype=jnp.bfloat16
    )
    params = GenerationParams(
        height=h, width=w, num_frames=num_frames - 1, frame_rate=25.0,
        num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )

    def run(seed):
        out = pipe(
            params, jax.random.PRNGKey(seed), embeds, mask,
            ref_image=ref, pose_frames=pose, output_type="uint8",
        )
        return np.asarray(out)

    out = run(5)  # compile + warm
    assert out.shape == (1, num_frames, h, w, 3), out.shape
    assert out.dtype == np.uint8

    times = []
    for seed in (6, 7, 8):
        t0 = time.perf_counter()
        run(seed)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    fps = num_frames / dt

    print(
        json.dumps(
            {
                "metric": "avatar_gen_frames_per_sec_per_chip_256px_97f_40steps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
