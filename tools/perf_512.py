"""512px 161-frame single-chip benchmark + audit (SURVEY long-context
config; VERDICT r2 item 4).

The BASELINE v5p-64 512px/161f deliverable's single-chip anchor: 5376
tokens/step, blocked bounded-logit flash attention + long-sequence W8A8
Pallas path.  For each precision prints a JSON line with the e2e fps AND
the per-stage audit: dit_step_ms (40-vs-1-step latent diff), analytic
TFLOP split (matmul vs attention), MFU against the v5e bf16 peak and
against a matmul/attention-aware ceiling, encode/decode/host remainder.

Usage: python tools/perf_512.py [bf16] [w8a8]   (default: both)
"""
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae
from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12
FLASH_L5376_TFS = 98e12  # measured kernel ceiling at L=5376, head_dim 64

h = w = 512
nf = 161
N_TOK = (nf // 8 + 1) * (h // 32) * (w // 32)  # 5376

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


def dit_flops():
    """Analytic FLOP split for one DiT forward at N_TOK tokens."""
    c = dit_cfg
    matmul = c.num_layers * (
        6 * N_TOK * c.inner_dim**2 * 2
        + 2 * N_TOK * c.inner_dim * c.inner_dim * c.ff_mult * 2
    )
    attn = c.num_layers * (
        2 * N_TOK * N_TOK * c.inner_dim * 2      # self QK^T + PV
        + 2 * N_TOK * 256 * c.inner_dim * 2      # cross QK^T + PV
    )
    return matmul, attn


def best(fn, n=3):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(6 + i)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def audit(tag, kw):
    pipe = LTXVideoPipeline(dit_cfg, dp, vae_cfg, vp, **kw)

    def run(seed, output_type="yuv420", p=gp):
        return pipe(p, jax.random.PRNGKey(seed), embeds, mask, ref_image=ref,
                    pose_frames=pose, output_type=output_type)

    # e2e pipelined fps
    np.asarray(run(5))
    t0 = time.perf_counter()
    outs = []
    for i in range(2):
        oo = run(6 + i)
        oo.copy_to_host_async()
        outs.append(oo)
    for oo in outs:
        np.asarray(oo)
    e2e_s = (time.perf_counter() - t0) / 2

    # device-only e2e: fetch a single row of the uint8 output — waits for
    # the full pipeline (encode + 40 steps + decode) but moves ~768 bytes,
    # so tunnel D2H bandwidth (which swings >10x between axon sessions)
    # drops out.  fetch_s = e2e - device_e2e is then pure host transfer.
    def device_run(seed):
        np.asarray(run(seed)[0, 0, 0])

    device_e2e = best(device_run)

    # per-stage: latent-only at 40 and 1 steps -> dit step; decode = device e2e - 40-step latent
    def latent_run(seed, p):
        out = run(seed, output_type="latent", p=p)
        return float(jnp.sum(out[..., 0].astype(jnp.float32)))

    p1 = replace(gp, num_inference_steps=1)
    latent_run(5, gp), latent_run(5, p1)  # compile
    t40 = best(lambda s: latent_run(s, gp))
    t1 = best(lambda s: latent_run(s, p1))
    step_s = (t40 - t1) / 39

    matmul_f, attn_f = dit_flops()
    total_f = matmul_f + attn_f
    mfu_bf16 = total_f / step_s / V5E_BF16_PEAK
    # precision-aware ceiling: weight matmuls at the active matmul peak,
    # attention always bf16 (the flash kernel) at its measured L=5376 rate
    matmul_peak = V5E_INT8_PEAK if tag == "w8a8" else V5E_BF16_PEAK
    step_floor_s = matmul_f / matmul_peak + attn_f / FLASH_L5376_TFS
    util_vs_floor = step_floor_s / step_s

    row = {
        "config": f"512px_{nf}f_40steps_{tag}",
        "fps": round(nf / e2e_s, 2),
        "e2e_s_per_video": round(e2e_s, 3),
        "dit_step_ms": round(step_s * 1e3, 2),
        "dit_40steps_s": round(40 * step_s, 3),
        "dit_tflop_per_step": round(total_f / 1e12, 2),
        "attn_tflop_per_step": round(attn_f / 1e12, 2),
        "dit_mfu_vs_v5e_bf16_peak": round(mfu_bf16, 3),
        "dit_util_vs_precision_aware_floor": round(util_vs_floor, 3),
        "overhead_latent1_s": round(t1, 3),  # encode + 1 step + loop setup
        "device_e2e_s": round(device_e2e, 3),
        "decode_s": round(device_e2e - t40, 3),  # VAE decode+postprocess (device)
        "fetch_s": round(e2e_s - device_e2e, 3),  # tunnel D2H minus pipeline overlap
        "device_fps": round(nf / device_e2e, 2),
        "tokens": N_TOK,
    }
    print(json.dumps(row), flush=True)
    del pipe
    import gc

    gc.collect()
    return row


if __name__ == "__main__":
    which = sys.argv[1:] or ["bf16", "w8a8"]
    for tag in which:
        kw = {} if tag == "bf16" else dict(quantize_weights="w8a8",
                                           quantize_vae="w8a8")
        audit(tag, kw)
