"""Probe: device-side batch scaling of the 256px pipeline.

bench.py's batch rows (pipelined wall clock incl. D2H fetch) showed batch2
BELOW batch1 aggregate throughput; this separates device compute from fetch:
latent-only 40-step runs + full runs with scalar-forced completion.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def main():
    pipe, raw = bench.build_pipeline()
    h = w = 256
    nf = 97
    from avatar_tpu.pipelines import GenerationParams

    params = GenerationParams(
        height=h, width=w, num_frames=nf - 1, frame_rate=25.0,
        num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )
    for batch in (1, 2, 4):
        inputs = bench.make_inputs(batch, h, w, nf)
        embeds, mask, ref, pose = inputs

        def latent_run(seed):
            out = pipe(params, jax.random.PRNGKey(seed), embeds, mask,
                       ref_image=ref, pose_frames=pose, output_type="latent")
            return float(jnp.sum(out[..., 0].astype(jnp.float32)))

        def full_run(seed):
            out = pipe(params, jax.random.PRNGKey(seed), embeds, mask,
                       ref_image=ref, pose_frames=pose, output_type="yuv420")
            # force completion without fetching the frames
            return float(jnp.sum(out[:, 0, 0, :8].astype(jnp.float32)))

        latent_run(5)
        full_run(5)

        def best(fn, n=3):
            ts = []
            for i in range(n):
                t0 = time.perf_counter()
                fn(6 + i)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lat = best(latent_run)
        t_full = best(full_run)
        print(f"batch={batch}: latent40 {t_lat:.3f}s  full(device) "
              f"{t_full:.3f}s  -> device fps {batch*nf/t_full:6.1f}  "
              f"decode+enc {t_full-t_lat:.3f}s", flush=True)


if __name__ == "__main__":
    main()
