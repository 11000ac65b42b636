"""Benchmark: avatar video generation throughput on one TPU chip.

Workload = BASELINE config 3 / the north-star metric: image+text -> 97-frame
256px talking-avatar video with the 2B DiT (28L x 2048d) + 128-ch causal
video VAE, 40 rectified-flow steps at the avatar operating point
(guidance 1.0, stg 0.0, decode_timestep 0.05, bf16 — reference
configs/inference-avatars.yaml:4-13).

Measurement: sustained throughput over NUM_VIDEOS back-to-back generations
with host fetches overlapped against the next video's compute
(copy_to_host_async) — the steady-state serving pattern.  The axon tunnel's
host-transfer bandwidth fluctuates by >10x between sessions; overlapping
keeps the metric about the chip, not the tunnel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
details carries the audit trail (DiT step ms, MFU, bytes/step from XLA cost
analysis, batch scaling) per VERDICT round-1 item 6.

vs_baseline: the reference publishes no numbers (BASELINE.md "A100 estimate
arithmetic"); baseline = estimated 17.5 frames/s for the eager-torch
reference on one A100.
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

A100_REFERENCE_FPS_ESTIMATE = 17.5  # see BASELINE.md for the arithmetic
V5E_BF16_PEAK = 197e12
NUM_VIDEOS = 4

# Run-integrity sanity bounds (VERDICT r4 item 1): a killed client's queued
# programs keep running server-side on the shared axon device, so a fresh
# bench can silently inherit a wedged queue — the round-4 artifact recorded
# t5_init_s=827 (expected ~90) and rows 8-12% low without noticing. Any
# stage exceeding its bound tags the WHOLE run "contaminated" in the JSON
# so a poisoned session is never mistaken for a regression.
PREFLIGHT_BOUND_S = 90.0   # tiny-matmul compile + roundtrip; clean ~4 s
T5_INIT_BOUND_S = 270.0    # 3x the expected ~90 s fresh-device init
_integrity = {"signals": []}


def _flag(signal: str) -> None:
    _integrity["signals"].append(signal)


def preflight() -> float:
    """Queue-wedge probe: one tiny program + scalar fetch, timed. On a
    clean device this is compile (~3-4 s) + a millisecond roundtrip; a
    wedged queue (leftover programs from a killed client) shows up as a
    long block BEFORE any heavy section runs.

    Client INIT is forced first and excluded from the probe: fresh-client
    init through the axon tunnel legitimately swings 3 s -> minutes with
    host load (the 09:03 r5 validation run spent ~75 s of an 80 s
    "preflight" on init alone), and a slow init is NOT queue wedging —
    only the post-init probe time is."""
    t_init = time.perf_counter()
    jax.devices()  # backend/client init, not a queue signal
    init_s = time.perf_counter() - t_init
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    float(jnp.sum(jnp.dot(x, x).astype(jnp.float32)))
    dt = time.perf_counter() - t0
    if dt > PREFLIGHT_BOUND_S:
        _flag(f"preflight probe {dt:.1f}s > {PREFLIGHT_BOUND_S}s (after "
              f"{init_s:.1f}s client init): device queue likely wedged "
              "by a prior client's programs")
    return init_s + dt

# Precision-aware floor rates, same convention as the 512px row
# (docs/PERF_512_AUDIT.md): int8 matmuls priced at the 394 TOP/s MXU int8
# peak, attention at the MEASURED kernel rate for the shape (the fused
# token-major kernel sustains ~65 TF/s at L=832 d=64 — 0.21 TFLOP in
# ~3.2 ms/step; the d=64 structural ceiling is 98.5). An earlier draft
# priced the int8 dots at an isolated-probe 215 TOP/s, which the fused
# end-to-end step BEAT (util 1.22) — isolation probes under-read XLA's
# epilogue fusion, so the hardware peak is the only honest denominator.
INT8_PEAK = 394e12       # v5e int8 MXU peak (2x bf16)
ATTN_RATE_832 = 65e12    # fused token-major kernel, L=832, d=64


def cheap_params(init_fn, scale=0.05):
    """Pseudo-random bf16 param tree matching ``init_fn``'s shapes WITHOUT
    threefry (jax.random generates ~10M elem/s through the axon tunnel — a
    2B-param init would read as a hang). Sin-hash over iota is
    timing-equivalent for benchmarking: MXU/HBM throughput is
    value-independent. Same trick as t5_stage's cheap_init."""
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    leaves, treedef = jax.tree.flatten(shapes)

    def build():
        out = []
        for i, leaf in enumerate(leaves):
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            x = jnp.arange(n, dtype=jnp.float32)
            x = jnp.sin(x * 12.9898 + float(i)) * 43758.5453
            x = x - jnp.floor(x) - 0.5
            out.append((x * scale).astype(jnp.bfloat16).reshape(leaf.shape))
        return jax.tree.unflatten(treedef, out)

    return jax.jit(build)()


def training_comps():
    """[dit_cfg, dit_params, vae_cfg, vae_params] with cheap-init bf16
    weights, for running training_stage in a FRESH process (clean HBM +
    allocator — the robust fix for the r4 driver artifact's full_b8
    RESOURCE_EXHAUSTED). Step timing is value-independent, so cheap-init
    weights measure the same step as the pipeline's real init."""
    vae_cfg = VAEConfig.from_dict(
        {**LTX_VAE_CONFIG, "timestep_conditioning": True})
    dit_cfg = DiTConfig()
    dit_params = cheap_params(lambda k: init_dit(k, dit_cfg))
    vae_params = cheap_params(lambda k: init_vae(k, vae_cfg))
    return [dit_cfg, dit_params, vae_cfg, vae_params]


def build_pipeline():
    """Returns (pipeline, raw_components). The pipeline permutes dit params
    into the split-RoPE layout at init, so building a second pipeline (the
    W8A8 row) must start from the raw components, not pipe.dit_params."""
    vae_cfg = VAEConfig.from_dict({**LTX_VAE_CONFIG, "timestep_conditioning": True})
    dit_cfg = DiTConfig()

    def bf16(t):
        # leaf-wise cast with eager freeing: with the int8 T5 encoder now
        # HBM-resident (t5_stage), a whole-tree astype would hold the 8 GB
        # f32 DiT master AND the 4 GB bf16 copy simultaneously -> OOM.
        # Rebinding each leaf drops the last f32 reference as we go, so
        # the peak stays ~one tree + one leaf.
        leaves, treedef = jax.tree.flatten(t)
        del t
        for i in range(len(leaves)):
            leaves[i] = leaves[i].astype(jnp.bfloat16)
        return jax.tree.unflatten(treedef, leaves)

    vae_params = bf16(init_vae(jax.random.PRNGKey(0), vae_cfg))
    dit_params = bf16(init_dit(jax.random.PRNGKey(1), dit_cfg))
    pipe = LTXVideoPipeline(dit_cfg, dit_params, vae_cfg, vae_params)
    return pipe, (dit_cfg, dit_params, vae_cfg, vae_params)


def t5_stage():
    """Measure the T5-XXL text encode ON DEVICE at real shape (24L x 4096d
    x 10240ff, 4.76B params) and return its embeddings AND the int8
    quantized encoder for the rest of the bench — so the measured path
    includes a real T5 forward, not injected random embeds (VERDICT r2
    item 3), and novel-prompt serving is measured with the encoder
    HBM-resident (VERDICT r3 item 2).

    Memory model (16 GB v5e HBM): T5-XXL bf16 is ~9.5 GB — beside the bf16
    DiT (4.0 GB + 0.5 GB split-RoPE q/k copies) + VAE (~0.9 GB) + decode
    workspace that forces encode-then-free (the r2/r3 pattern, mirroring
    the reference's CPU-offload of the text encoder on <30 GB GPUs,
    /root/reference/ltx_video/inference.py:373). Weight-only int8
    (utils/quantize.py:quantize_t5_params) drops the weights to 4.76 GB
    (+0.26 GB bf16 embedding table), which DOES fit beside the 256px
    serving stack — the bf16 master is donated away during the on-device
    quantize, and the int8 encoder stays resident for the
    t5_resident measurement in main().
    """
    from avatar_tpu.models.t5 import T5Config, init_t5_encoder, t5_encode
    from avatar_tpu.utils.quantize import quantize_t5_params

    t5_cfg = T5Config()  # XXL encoder defaults

    t0 = time.perf_counter()
    # cheap_params: sin-hash fill, no threefry (generating 4.76B params
    # through jax.random measured ~500 s on the axon tunnel)
    params = cheap_params(
        lambda k: init_t5_encoder(k, t5_cfg, dtype=jnp.bfloat16))
    float(jnp.sum(params["final_norm"].astype(jnp.float32)))  # force done
    init_s = time.perf_counter() - t0
    if init_s > T5_INIT_BOUND_S:
        _flag(f"t5_init {init_s:.0f}s > {T5_INIT_BOUND_S:.0f}s (expect ~90 "
              "fresh): rows below are queue-contaminated, not regressions")
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, t5_cfg.vocab_size, (1, 256)),
        jnp.int32,
    )
    mask = jnp.ones((1, 256), jnp.float32)
    enc = jax.jit(lambda p, i, m: t5_encode(p, t5_cfg, i, m))
    out = enc(params, ids, mask)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + first run

    def time_encode(p):
        """(sync_s, pipelined_s): sync includes the ~25 ms axon tunnel
        dispatch+fetch round trip per call; pipelined (8 dispatches, one
        tail scalar fetch) is the steady-state serving number and tracks
        the xprof device time within ~15%."""
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = enc(p, ids, mask)
            float(jnp.sum(o.astype(jnp.float32)))  # scalar, not bulk D2H
            ts.append(time.perf_counter() - t0)
        sync = min(ts)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [enc(p, ids, mask) for _ in range(8)]
            float(jnp.sum(outs[-1].astype(jnp.float32)))
            ts.append((time.perf_counter() - t0) / 8)
        return sync, min(ts)

    t5_s, t5_piped_s = time_encode(params)

    embeds = out.astype(jnp.bfloat16)  # independent buffer; bf16 master goes
    del out

    # int8 residency: quantize on device (donating the bf16 tree) and
    # re-measure the encode. Mode is w8a8, not w8: at M=256 the bf16
    # matmul's HBM ceiling equals its MXU ceiling (~12 ms), so halving
    # weight bytes alone buys nothing (xprof: the dequant fuses but the
    # fused dot turns compute-bound at the same 173 TF/s). The int8 MXU
    # path (act quant + int8 dot, 303 TF/s measured) is what actually
    # cuts the encode: 22.0 -> 14.0 ms/encode pipelined. Footprint is the
    # same int8 weights either way.
    t0 = time.perf_counter()
    params_q = jax.jit(lambda p: quantize_t5_params(p, mode="w8a8"),
                       donate_argnums=0)(params)
    float(jnp.sum(params_q["final_norm"].astype(jnp.float32)))
    quant_s = time.perf_counter() - t0
    del params
    import gc

    gc.collect()
    o = enc(params_q, ids, mask)
    float(jnp.sum(o.astype(jnp.float32)))  # compile
    del o
    t5_q_s, t5_q_piped_s = time_encode(params_q)

    int8_bytes = sum(
        p.size * p.dtype.itemsize for p in jax.tree.leaves(params_q)
    )
    stats = {
        "t5_encode_ms": round(t5_s * 1e3, 2),
        "t5_encode_pipelined_ms": round(t5_piped_s * 1e3, 2),
        "t5_int8_encode_ms": round(t5_q_s * 1e3, 2),
        "t5_int8_encode_pipelined_ms": round(t5_q_piped_s * 1e3, 2),
        "t5_int8_mode": "w8a8 (int8 MXU dot; w8 measured speed-neutral — "
                        "bf16 HBM ceiling == bf16 MXU ceiling at M=256)",
        "t5_params_b": n_params,
        "t5_hbm_gb_bf16": round(n_params * 2 / 1e9, 2),
        "t5_hbm_gb_int8": round(int8_bytes / 1e9, 2),
        "t5_init_s": round(init_s, 1),
        "t5_quantize_s": round(quant_s, 1),
        "resident": "int8 w8a8, HBM-resident beside DiT+VAE at "
                    "256px (bf16 XXL was encode-then-free; see "
                    "t5_resident row)",
    }
    return embeds, mask, t5_q_s, stats, (params_q, t5_cfg, enc, ids, mask)


def training_stage(comps):
    """Driver-visible training perf rows at the BASELINE operating point
    (configs/train-avatars.yaml: batch 8, 57f@320x192 -> 480-token latents).

    - lora_b8: LoRA r=32 (train_mode=lora_audio) step, pipelined wall like
      cli/train.py's deferred-metrics loop (tools/profile_train.py is the
      xprof version; CLAUDE.md round-3 anchor ~303 ms = 26.4 samples/s).
    - decoder_b2: decoder fine-tune step (train/decoder.py), b=2 33f@256px,
      remat on (backward through the full-res decode OOMs without it).
    - full_b8: "full" mode (0.97B trainable) with the round-3 winning
      combo adafactor + remat=dots (anchor 459 ms/step). Runs LAST with
      the VAE params freed first: f32 masters + grads + remat activations
      leave no room for anything else beside the 4 GB bf16 DiT.

    ``comps`` is a MUTABLE list [dit_cfg, dit_params, vae_cfg, vae_params]
    (the caller deletes its own reference) so rows can free components
    they're done with. Normally runs inside tools/bench_training_rows.py —
    a fresh process with cheap-init weights (training_comps) so full_b8's
    f32 masters land in an unfragmented HBM.
    """
    from avatar_tpu.core.config import TrainConfig
    from avatar_tpu.train.train import (init_trainable, make_optimizer,
                                        make_train_step)

    rows = {}
    dit_cfg, params, vae_cfg, vae_params = comps
    b, f, h, w, c = 8, 8, 6, 10, 128
    batch = {
        "latents": jax.random.normal(
            jax.random.PRNGKey(2), (1, b, f, h, w, c), jnp.bfloat16),
        "ref_image_latents": jax.random.normal(
            jax.random.PRNGKey(5), (1, b, 1, h, w, c), jnp.bfloat16),
        "pose_latents": jax.random.normal(
            jax.random.PRNGKey(6), (1, b, f, h, w, c), jnp.bfloat16),
    }
    embeds = jax.random.normal(jax.random.PRNGKey(4), (b, 256, 4096),
                               jnp.bfloat16)
    mask = jnp.ones((b, 256))

    def pipelined_ms(step, trainable, opt_state, n=8):
        """Steady-state wall like cli/train.py drain_metrics: fetch step
        i-1's metrics after dispatching step i."""
        trainable, opt_state, m = step(trainable, opt_state, params, batch,
                                       embeds, mask, jax.random.PRNGKey(0))
        float(m["loss"])  # compile + first step
        pending = None
        t0 = time.perf_counter()
        for i in range(n):
            trainable, opt_state, m = step(
                trainable, opt_state, params, batch, embeds, mask,
                jax.random.PRNGKey(1 + i))
            if pending is not None:
                float(pending["loss"])
            pending = m
        float(pending["loss"])
        dt = (time.perf_counter() - t0) / n
        del trainable, opt_state
        return dt * 1e3

    import gc

    def dit_row(tag, mode, opts, _retry=True):
        trainable = opt_state = None
        try:
            cfg = TrainConfig(checkpoint_path="", train_mode=mode,
                              learning_rate=1e-4,
                              gradient_accumulation_steps=1, **opts)
            trainable = init_trainable(jax.random.PRNGKey(1), params,
                                       dit_cfg, cfg)
            opt = make_optimizer(cfg)
            opt_state = opt.init(trainable)
            step = make_train_step(dit_cfg, cfg, opt)
            ms = pipelined_ms(step, trainable, opt_state)
            rows[tag] = {"step_ms": round(ms, 1),
                         "samples_per_s": round(b / ms * 1e3, 2)}
        except Exception as e:
            if _retry and "RESOURCE_EXHAUSTED" in str(e):
                # the round-4 driver artifact recorded exactly this on
                # full_b8: HBM held by earlier stages' cached executables
                # (TPU program text lives in HBM) and fragmentation. Drop
                # every compiled program and retry once — the persistent
                # compile cache makes the recompile cheap.
                trainable = opt_state = None
                gc.collect()
                jax.clear_caches()
                rows[f"{tag}_oom_retry"] = True
                return dit_row(tag, mode, opts, _retry=False)
            rows[tag] = f"failed: {e}"[:80]
            _flag(f"training row {tag} failed: {e}"[:120])
        finally:
            trainable = opt_state = None  # noqa: F841 — frees f32 masters
            gc.collect()

    dit_row("lora_b8", "lora_audio",
            dict(lora_rank=32, lora_alpha=32, gradient_checkpointing=False))

    try:
        import optax

        from avatar_tpu.train.decoder import (init_decoder_trainable,
                                              make_decoder_train_step)

        cfg = TrainConfig(checkpoint_path="", train_mode="decoder",
                          learning_rate=1e-5, gradient_checkpointing=True,
                          gradient_accumulation_steps=1)
        trainable = init_decoder_trainable(vae_params)
        opt = optax.adamw(1e-5)
        opt_state = opt.init(trainable)
        dstep = make_decoder_train_step(vae_cfg, cfg, opt)
        db = {
            "latents": jax.random.normal(
                jax.random.PRNGKey(8), (1, 2, 5, 8, 8, 128), jnp.bfloat16),
            "pixels": jax.random.randint(
                jax.random.PRNGKey(9), (1, 2, 33, 256, 256, 3), 0, 255,
                jnp.uint8),
        }
        trainable, opt_state, m = dstep(trainable, opt_state, vae_params,
                                        db, jax.random.PRNGKey(0))
        float(m["loss"])
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            trainable, opt_state, m = dstep(
                trainable, opt_state, vae_params, db,
                jax.random.PRNGKey(1 + i))
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        rows["decoder_b2_33f_256px"] = {"step_ms": round(min(ts) * 1e3, 1)}
        del trainable, opt_state, db, m
    except Exception as e:
        rows["decoder_b2_33f_256px"] = f"failed: {e}"[:80]
    gc.collect()

    # full mode needs every byte: drop the VAE params (comps is ours — the
    # caller released its reference) before the 3.9 GB f32 masters + grads
    # + remat activations land beside the 4 GB bf16 DiT.
    comps[2] = comps[3] = None
    vae_cfg = vae_params = None  # noqa: F841
    gc.collect()
    dit_row("full_b8", "full",
            dict(optimizer="adafactor", gradient_checkpointing=True,
                 remat_policy="dots"))
    return rows


def make_inputs(batch, h, w, num_frames, embeds=None, mask=None):
    if embeds is None:
        embeds = jax.random.normal(
            jax.random.PRNGKey(2), (1, 256, 4096), dtype=jnp.bfloat16
        )
        mask = jnp.ones((1, 256))
    embeds = jnp.broadcast_to(embeds, (batch,) + embeds.shape[1:])
    mask = jnp.broadcast_to(mask, (batch,) + mask.shape[1:])
    ref = jax.random.normal(
        jax.random.PRNGKey(3), (batch, 1, h, w, 3), dtype=jnp.bfloat16
    )
    pose = jax.random.normal(
        jax.random.PRNGKey(4), (batch, num_frames, h, w, 3), dtype=jnp.bfloat16
    )
    return embeds, mask, ref, pose


def run_batch(pipe, params, inputs, seed, output_type="yuv420"):
    embeds, mask, ref, pose = inputs
    return pipe(
        params, jax.random.PRNGKey(seed), embeds, mask,
        ref_image=ref, pose_frames=pose, output_type=output_type,
    )


def throughput(pipe, params, inputs, batch, num_frames, n_videos=NUM_VIDEOS,
               output_type="yuv420"):
    """Pipelined: dispatch run i+1 while run i's frames stream to the host.

    Default output is device-side I420 planes — complete decodable video
    frames at 1.5 bytes/pixel (what x264/ffmpeg consume; parity with cv2
    tested), so the metric measures the chip, not the host link."""
    out = run_batch(pipe, params, inputs, seed=5, output_type=output_type)
    if output_type == "yuv420":
        assert out.shape[1:] == (num_frames, params.height * 3 // 2,
                                 params.width)
    else:
        assert out.shape[1:] == (num_frames, params.height, params.width, 3)
    assert out.dtype == jnp.uint8
    np.asarray(out)

    def one_round(base_seed):
        t0 = time.perf_counter()
        outs = []
        for i in range(n_videos):
            o = run_batch(pipe, params, inputs, seed=base_seed + i,
                          output_type=output_type)
            o.copy_to_host_async()
            outs.append(o)
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    # two rounds, best: the tunnel's D2H bandwidth fluctuates >10x and a
    # single slow fetch would otherwise dominate the metric
    dt = min(one_round(6), one_round(6 + n_videos))
    return (n_videos * batch * num_frames) / dt


def dit_step_stats(pipe, params, inputs, num_frames):
    """Per-step time via the (40-step minus 1-step) latent-only difference +
    XLA cost analysis of the compiled denoiser."""
    from dataclasses import replace

    embeds, mask, ref, pose = inputs

    def latent_run(p, seed):
        out = pipe(p, jax.random.PRNGKey(seed), embeds, mask,
                   ref_image=ref, pose_frames=pose, output_type="latent")
        return float(jnp.sum(out[..., 0].astype(jnp.float32)))

    p40, p1 = params, replace(params, num_inference_steps=1)
    latent_run(p40, 5), latent_run(p1, 5)  # compile

    def best(fn, n=3):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(6 + i)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t40 = best(lambda s: latent_run(p40, s))
    t1 = best(lambda s: latent_run(p1, s))
    step_s = (t40 - t1) / 39

    # Analytic FLOPs for one DiT forward at this token count (matches XLA
    # cost analysis: 2.87 TFLOP at 832 tokens, tools/perf_dit.py).
    n_tok = (num_frames // 8 + 1) * (params.height // 32) * (params.width // 32)
    c = pipe.dit_cfg
    per_block = (
        6 * n_tok * c.inner_dim**2 * 2          # qkv, out, q2, out2
        + 2 * n_tok * n_tok * c.inner_dim * 2   # self-attn QK^T + PV
        + 2 * n_tok * 256 * c.inner_dim * 2     # cross-attn QK^T + PV
        + 2 * n_tok * c.inner_dim * c.inner_dim * c.ff_mult * 2  # FF
    )
    flops = c.num_layers * per_block
    mfu = flops / step_s / V5E_BF16_PEAK
    return step_s, flops, mfu


def main():
    preflight_s = preflight()

    # T5 first; the int8-quantized encoder stays HBM-resident through the
    # 256px sections (VERDICT r3 item 2) and is freed before 512px.
    try:
        t5_embeds, t5_mask, t5_s, t5_stats, t5_resident = t5_stage()
    except Exception as e:
        t5_embeds = t5_mask = None
        t5_s, t5_stats, t5_resident = 0.0, f"failed: {e}"[:120], None

    pipe, raw = build_pipeline()
    h = w = 256
    num_frames = 97

    def gen_params():
        return GenerationParams(
            height=h, width=w, num_frames=num_frames - 1, frame_rate=25.0,
            num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
            rescaling_scale=1.0, decode_timestep=0.05,
        )

    params = gen_params()
    inputs1 = make_inputs(1, h, w, num_frames, t5_embeds, t5_mask)
    fps = throughput(pipe, params, inputs1, 1, num_frames)

    step_s, step_flops, mfu = dit_step_stats(pipe, params, inputs1, num_frames)

    fps_rgb = throughput(pipe, params, inputs1, 1, num_frames,
                         output_type="uint8")

    # single-video latency, device-side (forced completion; excludes the
    # axon tunnel's D2H fetch, which fluctuates >10x between sessions)
    def one_video(seed):
        out = run_batch(pipe, params, inputs1, seed)
        return float(jnp.sum(out[:, 0, 0, :8].astype(jnp.float32)))

    one_video(5)
    lat_ts = []
    for i in range(3):
        t0 = time.perf_counter()
        one_video(6 + i)
        lat_ts.append(time.perf_counter() - t0)
    latency_device_s = min(lat_ts)
    # e2e including one T5 encode per video (unique prompt per video —
    # repeated prompts amortize the encode to ~0)
    e2e_t5_fps = num_frames / (num_frames / fps + t5_s) if fps else None

    # Novel-prompt serving with the int8 T5 HBM-RESIDENT beside the full
    # bf16 pipeline: a fresh 256-token prompt is encoded for every video
    # inside the pipelined loop — the e2e a serving user actually sees
    # (no precomputed embeds, no 94 s encoder reload). VERDICT r3 item 2.
    t5_resident_row = None
    if t5_resident is not None:
        try:
            t5p, _, t5_enc, _, t5m = t5_resident
            rng0 = np.random.default_rng(1)
            ids_list = [
                jnp.asarray(rng0.integers(1, 32128, (1, 256)), jnp.int32)
                for _ in range(NUM_VIDEOS)
            ]
            _, _, ref1, pose1 = inputs1

            def resident_round(base_seed):
                t0 = time.perf_counter()
                outs = []
                for i in range(NUM_VIDEOS):
                    emb = t5_enc(t5p, ids_list[i], t5m).astype(jnp.bfloat16)
                    o = run_batch(pipe, params, (emb, t5m, ref1, pose1),
                                  seed=base_seed + i)
                    o.copy_to_host_async()
                    outs.append(o)
                for o in outs:
                    np.asarray(o)
                return time.perf_counter() - t0

            resident_round(40)  # warm (all shapes already compiled)
            dt = min(resident_round(41), resident_round(41 + NUM_VIDEOS))
            t5_resident_row = {
                "fps": round(NUM_VIDEOS * num_frames / dt, 2),
                "note": "fresh prompt T5-encoded per video, int8 encoder "
                        "resident beside bf16 DiT+VAE",
            }
        except Exception as e:
            t5_resident_row = f"failed: {e}"[:100]
        # free the encoder before the heavier sections (batch, w8a8 copy,
        # 512px decode) — residency is claimed for the 256px serving point
        t5_resident = t5p = t5_enc = None  # noqa: F841
        import gc

        gc.collect()

    details = {
        "t5": t5_stats,
        "e2e_with_t5_fps": round(e2e_t5_fps, 2) if e2e_t5_fps else None,
        "t5_resident": t5_resident_row,
        "output_format": "yuv420 (I420 planes, cv2-parity tested)",
        "rgb_uint8_fps": round(fps_rgb, 2),
        "single_video_latency_device_s": round(latency_device_s, 3),
        "dit_step_ms": round(step_s * 1e3, 2),
        "dit_step_tflop": round(step_flops / 1e12, 2) if step_flops else None,
        "dit_mfu_vs_v5e_bf16_peak": round(mfu, 3) if mfu else None,
        "pipelined_videos": NUM_VIDEOS,
        "batch_scaling": {},
        # VERDICT r3 item 4: near-flat device-side batch scaling is the
        # EXPECTED behavior, not a bug — the b=1 DiT step already runs at
        # ~75% MFU (bf16; w8a8 ~60% of the int8 peak), and matmul FLOPs,
        # attention FLOPs, and VAE conv work all scale linearly with
        # batch, so a saturated MXU gains nothing from batching. The
        # +5-10% at b4 is the amortized fixed work: per-call host dispatch
        # (~25 ms/video) and the loop-invariant prologue (cross-kv/caption
        # projection, timestep embeds) which is per-batch, not per-sample.
        # Batching's production value is request coalescing (fewer
        # dispatches, one compile bucket) — measured in the w8a8 serving
        # row — not MXU utilization.
        "batch_scaling_explained": "flat-by-design: b=1 already MXU-bound "
            "(see dit_mfu_*); gains = amortized dispatch + per-batch "
            "prologue only",
    }

    # batch scaling rows (weight reads amortize across samples) — device-side
    # fps: forced-completion scalar fetch, not the frame pull.  The pipelined
    # wall-clock used for the headline under-reports batched runs here because
    # the tunnel D2H fetch of batch*97 frames stops overlapping at 2 videos in
    # flight (device-side probe: b1/b2/b4 = 104/108/112 f/s, tools/archive/probe_batch.py).
    for batch in (2, 4):
        inputs_b = make_inputs(batch, h, w, num_frames, t5_embeds, t5_mask)
        try:
            def full_run(seed):
                out = run_batch(pipe, params, inputs_b, seed)
                return float(jnp.sum(out[:, 0, 0, :8].astype(jnp.float32)))

            full_run(5)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                full_run(6 + i)
                ts.append(time.perf_counter() - t0)
            details["batch_scaling"][f"batch{batch}_device_fps"] = round(
                batch * num_frames / min(ts), 2)
        except Exception as e:  # OOM guard on small chips
            details["batch_scaling"][f"batch{batch}_device_fps"] = (
                f"failed: {e}"[:80])

    # W8A8 int8 serving row (opt-in pipeline mode; headline stays bf16 —
    # int8 output quality vs the real 2B weights is not verifiable in this
    # environment, so the speed is reported as a detail, not the metric)
    try:
        pipe_q = LTXVideoPipeline(*raw, quantize_weights="w8a8",
                                  quantize_vae="w8a8")
        fps_q = throughput(pipe_q, params, inputs1, 1, num_frames)
        step_q, flops_q, mfu_q = dit_step_stats(pipe_q, params, inputs1,
                                                num_frames)
        # 256px w8a8 floor row (VERDICT r3 item 10): same precision-aware
        # accounting as the 512px row — int8 matmuls at the 394 TOP/s MXU
        # peak, attention bf16 at the measured fused-kernel rate
        n_tok8 = (num_frames // 8 + 1) * (h // 32) * (w // 32)
        c8 = pipe_q.dit_cfg
        attn_f8 = c8.num_layers * (
            2 * n_tok8 * n_tok8 + 2 * n_tok8 * 256) * c8.inner_dim * 2
        floor_q = (flops_q - attn_f8) / INT8_PEAK + attn_f8 / ATTN_RATE_832
        details["w8a8"] = {
            "fps": round(fps_q, 2),
            "dit_step_ms": round(step_q * 1e3, 2),
            "dit_mfu_vs_v5e_bf16_peak": round(mfu_q, 3),
            "dit_util_vs_precision_aware_floor": round(floor_q / step_q, 3),
            "vae_convs": "int8",
        }

        # w8a8 batch scaling (device-side fps, forced completion). batch 1
        # included: the pipelined-wall "fps" above rides the tunnel's D2H
        # bandwidth, which swings >10x between sessions — batch1_device_fps
        # is the session-independent anchor for the b1 operating point.
        for batch in (1, 2, 4):
            inputs_b = (inputs1 if batch == 1 else
                        make_inputs(batch, h, w, num_frames, t5_embeds,
                                    t5_mask))
            def full_run_q(seed, _i=inputs_b):
                out = run_batch(pipe_q, params, _i, seed)
                return float(jnp.sum(out[:, 0, 0, :8].astype(jnp.float32)))
            full_run_q(5)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                full_run_q(6 + i)
                ts.append(time.perf_counter() - t0)
            details["w8a8"][f"batch{batch}_device_fps"] = round(
                batch * num_frames / min(ts), 2)
        # VERDICT r4 item 3 (the b2>b4 inversion in BENCH_r04): root cause
        # was the W8A8 Pallas long-sequence route keying on B*N tokens —
        # b4's 3328 tokens crossed the old 2048 threshold and left XLA's
        # fused int8 dot, which wins at batched 832-token shapes.
        # Threshold now 4096 (ops/int8_matmul.W8A8_PALLAS_MIN_TOKENS);
        # probe-isolated A/B on v5e: b4 147.7 -> at/above the b2 level.
        # The residual-memory hypothesis was disproven: b2/b4 measured
        # identical with and without the resident int8 T5 + bf16 pipe.
        details["w8a8"]["batch_scaling_explained"] = (
            "monotone after routing fix: per-sample seq len >= 4096 keeps "
            "the Pallas long-seq path for 512px only; 832-token shapes "
            "stay on XLA's fused int8 dot at any batch (int8_matmul.py "
            "note)")

        # Serving layer (pipelines/serving.py): dynamic-batched coalesced
        # throughput through AvatarServer — the driver-visible number for
        # the production path (VERDICT r3 item 4). 8 same-bucket requests,
        # max_batch=4 -> two batched generations, fetches overlapped.
        try:
            from avatar_tpu.pipelines.serving import (AvatarServer,
                                                      GenerationRequest)

            embeds1, mask1, ref1, pose1 = (np.asarray(x) for x in inputs1)
            server = AvatarServer(pipe_q, max_batch=4, batch_window_s=0.05)

            def serve_round(n_req, seed0):
                t0 = time.perf_counter()
                futs = [
                    server.submit(GenerationRequest(
                        params=params, prompt_embeds=embeds1,
                        prompt_attention_mask=mask1, ref_image=ref1,
                        pose_frames=pose1, seed=seed0 + i))
                    for i in range(n_req)
                ]
                for f in futs:
                    f.result(timeout=600)
                return time.perf_counter() - t0

            serve_round(4, 90)  # warm the batched-bucket compile
            n_req = 12  # 3 coalesced batches: the final batch's D2H fetch
            # can't overlap any next compute, so more batches amortize it
            dt = min(serve_round(n_req, 100), serve_round(n_req, 200))
            details["w8a8"]["serving"] = {
                "requests_per_s": round(n_req / dt, 3),
                "fps": round(n_req * num_frames / dt, 2),
                "max_batch": 4,
                "bottleneck": "tail-batch D2H fetch (tunnel) + per-batch "
                              "host dispatch; device compute itself is "
                              "MXU-bound (see batch_scaling_explained)",
            }
        except Exception as e:
            details["w8a8"]["serving"] = f"failed: {e}"[:80]
        finally:
            try:  # stop the worker + drop its pipe_q reference either way
                server.shutdown()
            except Exception:
                pass
            server = None  # noqa: F841
    except Exception as e:
        details["w8a8"] = f"failed: {e}"[:80]
    finally:
        pipe_q = None  # noqa: F841 — free the int8 copy even on failure

    # Long-context config (SURVEY §5 single-chip anchor): 512px 161 frames
    # = 5376 tokens/step — exercises the blocked bounded-logit flash kernel
    # and the long-sequence W8A8 Pallas path (tools/perf_512.py measures
    # both precisions; one w8a8 row here keeps bench runtime in check).
    try:
        import gc

        # free the bf16 pipeline's split-RoPE param copies and cached
        # conditioning before the 512px run — the full-res decode needs
        # the HBM headroom (a leftover pipeline OOMs it)
        del pipe
        gc.collect()
        params512 = GenerationParams(
            height=512, width=512, num_frames=160, frame_rate=25.0,
            num_inference_steps=40, guidance_scale=1.0, stg_scale=0.0,
            rescaling_scale=1.0, decode_timestep=0.05,
        )
        pipe_l = LTXVideoPipeline(*raw, quantize_weights="w8a8",
                                  quantize_vae="w8a8")
        inputs512 = (
            jax.random.normal(jax.random.PRNGKey(2), (1, 256, 4096),
                              dtype=jnp.bfloat16),
            jnp.ones((1, 256)),
            jax.random.normal(jax.random.PRNGKey(3), (1, 1, 512, 512, 3),
                              dtype=jnp.bfloat16),
            jax.random.normal(jax.random.PRNGKey(4), (1, 161, 512, 512, 3),
                              dtype=jnp.bfloat16),
        )
        fps_512 = throughput(pipe_l, params512, inputs512, 1, 161,
                             n_videos=2)
        # device-side fps: fetch one 512-byte row — waits for the full
        # pipeline but excludes the ~63 MB tunnel D2H (which swings >10x
        # between axon sessions and which the pipelined path overlaps)
        def _dev_run(seed):
            t0 = time.perf_counter()
            np.asarray(run_batch(pipe_l, params512, inputs512,
                                 seed=seed)[0, 0, 0])
            return time.perf_counter() - t0
        _dev_run(11)
        dev_s = min(_dev_run(12), _dev_run(13))
        # long-row audit, corrected floor (VERDICT r3 item 1; the full
        # per-op table + derivation live in docs/PERF_512_AUDIT.md):
        # int8 matmuls at the 394 TOP/s MXU peak, attention at the d=64
        # STRUCTURAL ceiling 98.5 TF/s (a 64-deep operand half-fills the
        # 128x128 systolic array), quant producers at the 819 GB/s HBM
        # roofline, and the XLA-fused glue (rope/residual/relayout) at its
        # IN-CONTEXT measured time (718 us/block, round-5 xprof of the
        # real 40-step loop): every glue row but `reshape` fuses above the
        # naive byte roofline even in-context (measured time IS its floor);
        # reshape runs at 611 GB/s and is priced at bytes/819. The r4
        # formula used the STANDALONE 28-block scan's 455 us/block — the
        # same ops run ~60% slower inside the full program (scheduling,
        # not recoverable op-by-op: an unrolled-28-distinct-blocks
        # standalone reproduces the fast 158.7 ms, the pipeline context
        # adds ~7.4 ms of glue-category time; docs/PERF_512_AUDIT.md r5).
        step5, flops5, mfu5 = dit_step_stats(pipe_l, params512, inputs512, 161)
        n_tok = 5376
        c = pipe_l.dit_cfg
        attn_f = c.num_layers * (2 * n_tok * n_tok + 2 * n_tok * 256) * c.inner_dim * 2
        prod_bytes = c.num_layers * n_tok * 3 * (
            c.inner_dim * c.ff_mult + 4 * c.inner_dim
        )  # act_quant (ff hidden) + 2x rms_mod + 2x quantize_rows (inner)
        glue_s = c.num_layers * 718e-6
        floor_s = ((flops5 - attn_f) / 394e12 + attn_f / 98.5e12
                   + prod_bytes / 819e9 + glue_s)
        details["long_context_512px_161f_w8a8"] = {
            "fps": round(fps_512, 2),
            "device_fps": round(161 / dev_s, 2),
            "dit_step_ms": round(step5 * 1e3, 2),
            "dit_step_tflop": round(flops5 / 1e12, 2),
            "dit_mfu_vs_v5e_bf16_peak": round(mfu5, 3),
            "dit_util_vs_precision_aware_floor": round(step5 and floor_s / step5, 3),
            "floor_audit": "docs/PERF_512_AUDIT.md (per-op table)",
            "breakdown": "tools/perf_512.py audits encode/decode/host split",
        }
    except Exception as e:
        details["long_context_512px_161f_w8a8"] = f"failed: {e}"[:80]
    finally:
        # drop the w8a8 512px pipeline even on failure — a leftover copy
        # (~3 GB int8 DiT+VAE) would shrink the training subprocess's HBM
        pipe_l = None  # noqa: F841

    # Training rows (VERDICT r3 item 3: regressions must be visible in the
    # driver artifact, not only in tools/profile_*). Runs last, in a FRESH
    # subprocess: the r4 artifact recorded full_b8 RESOURCE_EXHAUSTED and
    # the r5 in-process retry (scrub + clear_caches + recompile) ALSO
    # failed — whatever the inference stages leave behind (allocator
    # fragmentation, program text) survives every in-process scrub. A new
    # client gets a fresh server-side allocator; the parent frees its own
    # weights first so the child sees nearly the whole 16 GB.
    import gc
    import os
    import subprocess
    import sys

    del raw
    inputs1 = inputs_b = inputs512 = None  # noqa: F841
    t5_embeds = t5_mask = None  # noqa: F841
    gc.collect()
    jax.clear_caches()
    gc.collect()
    timed_out = False
    try:
        t_sub = time.perf_counter()
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_training_rows.py")],
            capture_output=True, text=True, timeout=2400)
        lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("TRAINING_ROWS_JSON ")]
        if not lines:
            raise RuntimeError(
                f"no TRAINING_ROWS_JSON line (exit {r.returncode}); "
                f"stderr tail: {r.stderr[-400:]}")
        rows = json.loads(lines[-1][len("TRAINING_ROWS_JSON "):])
        if r.returncode != 0:
            _flag(f"training subprocess exit {r.returncode} after printing "
                  f"rows; stderr tail: {r.stderr[-200:]}"[:200])
        rows["subprocess_wall_s"] = round(time.perf_counter() - t_sub, 1)
        rows["process"] = ("fresh subprocess (clean HBM/allocator; "
                           "cheap-init weights — step timing is "
                           "value-independent)")
        for tag, v in rows.items():
            if isinstance(v, str) and v.startswith("failed"):
                _flag(f"training row {tag} {v}"[:120])
        details["training"] = rows
    except Exception as e:
        timed_out = isinstance(e, subprocess.TimeoutExpired)
        _flag(f"training subprocess failed ({e}); "
              + ("timeout: NO in-process fallback (the killed child's "
                 "queued programs would wedge it)" if timed_out
                 else "in-process fallback")[:120])
        if timed_out:
            # A timeout-killed client leaves its queued programs running
            # server-side (CLAUDE.md) — an immediate in-process rerun would
            # measure a wedged queue or hang with no timeout. Record the
            # failure; the completed rows above must never be lost.
            details["training"] = f"failed: subprocess timeout ({e})"[:160]
        else:
            try:
                details["training"] = training_stage(training_comps())
            except Exception as e2:  # never lose the bench JSON
                _flag(f"in-process training fallback failed ({e2})"[:120])
                details["training"] = f"failed: {e2}"[:160]

    # Run-integrity verdict (VERDICT r4 items 1-2): contamination signals
    # mean the device queue was poisoned by another client — the rows are
    # then lower bounds on the chip, not regressions. R3 anchors let the
    # reader judge a CLEAN run at a glance.
    r3 = {"headline_fps": 103.5, "w8a8_fps": 141.4,
          "w8a8_b1_device_fps": 148.0}
    notes = []
    if not _integrity["signals"] and fps < 0.9 * r3["headline_fps"]:
        notes.append(
            f"headline {fps:.1f} f/s < 0.9x r3 anchor "
            f"{r3['headline_fps']} on a CLEAN preflight — regression?")
    w8 = details.get("w8a8")
    if not _integrity["signals"] and isinstance(w8, dict):
        # the pipelined-wall w8a8 fps rides the tunnel D2H bandwidth
        # (>10x session swings); judge regressions on the device-side b1
        # anchor, and explain a low wall row when the device row is fine
        b1 = w8.get("batch1_device_fps")
        if isinstance(b1, (int, float)):
            if b1 < 0.9 * r3["w8a8_b1_device_fps"]:
                notes.append(
                    f"w8a8 b1 device fps {b1:.1f} < 0.9x anchor "
                    f"{r3['w8a8_b1_device_fps']} — regression?")
            elif w8.get("fps", 0) < 0.9 * r3["w8a8_fps"]:
                notes.append(
                    f"w8a8 pipelined wall {w8['fps']:.1f} f/s below the "
                    f"{r3['w8a8_fps']} anchor but device-side b1 "
                    f"{b1:.1f} is at anchor: tunnel-fetch session "
                    "variance, not a compute regression")
    details["run_integrity"] = {
        "preflight_s": round(preflight_s, 2),
        "contaminated": bool(_integrity["signals"]),
        "signals": _integrity["signals"],
        "notes": notes,
        "r3_anchors": r3,
    }

    print(
        json.dumps(
            {
                "metric": "avatar_gen_frames_per_sec_per_chip_256px_97f_40steps",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 2),
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
