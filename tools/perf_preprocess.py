"""Latent-extraction throughput at the reference preprocessing operating
point (save_vae_latents.py:118-123 — 57-frame clips at 320x192, bf16 VAE
encode), measuring the 'saturate host->HBM' north star (BASELINE.md):

  1. host-only rate: video decode + PIL resize + [-1,1] normalize
     (the producer thread of cli/preprocess._iter_preprocessed_clips)
  2. device-only rate: jitted VAE encode of a resident clip
  3. end-to-end rate: the shipped double-buffered loop (decode thread
     feeding the device encode) on a synthetic mp4

and reports which side binds.  Run on the real chip: python tools/perf_preprocess.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CLIP, H, W = 57, 192, 320  # reference clip geometry (height 192, width 320)
N_CLIPS = 8


def make_video(path: str, num_frames: int, fps: float = 25.0):
    import cv2

    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (W * 2, H * 2))  # decode includes a resize step
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H * 2, W * 2, 3), np.uint8)
    for i in range(num_frames):
        frame = np.roll(base, i * 3, axis=1)
        wr.write(frame)
    wr.release()


def main():
    from avatar_tpu.cli.preprocess import VAEEncoder, _iter_preprocessed_clips
    from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae

    cfg = VAEConfig.from_dict(LTX_VAE_CONFIG)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    enc = VAEEncoder.from_params(params, cfg)

    tmp = tempfile.mkdtemp()
    # several files so the multi-producer decode engages (corpus-like input)
    vids = []
    for i in range(4):
        v = os.path.join(tmp, f"clip_src{i}.mp4")
        make_video(v, CLIP * (N_CLIPS // 4))
        vids.append(v)
    vid = vids[0]

    # --- device-only: resident clip, forced completion -------------------
    # uint8 input = the production path (device-side normalize, 4x less H2D)
    x = np.random.default_rng(1).integers(
        0, 255, (1, CLIP, H, W, 3), np.uint8)
    lat = enc.encode(x, seed=0)
    np.asarray(lat)

    def device_once(seed):
        out = enc.encode(x, seed=seed)
        return float(jnp.sum(out[..., 0].astype(jnp.float32)))

    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        device_once(i)
        ts.append(time.perf_counter() - t0)
    dev_s = min(ts)
    print(f"device encode: {dev_s*1e3:.0f} ms/clip "
          f"({CLIP/dev_s:.0f} frames/s)", flush=True)

    # --- host-only: drain the producer without encoding ------------------
    t0 = time.perf_counter()
    n = 0
    for item in _iter_preprocessed_clips(vids, CLIP, CLIP, H, W):
        n += 1
    host_s = (time.perf_counter() - t0) / max(n, 1)
    print(f"host decode+prep: {host_s*1e3:.0f} ms/clip "
          f"({CLIP/host_s:.0f} frames/s, {n} clips)", flush=True)

    # --- end-to-end double-buffered loop ----------------------------------
    # (as cmd_save_vae_latents runs it, minus the .npz disk write)
    last = None
    t0 = time.perf_counter()
    n = 0
    for x2, base, ci, s, e, fps in _iter_preprocessed_clips(
            vids, CLIP, CLIP, H, W, stage=jax.device_put):
        last = enc.encode(x2, seed=ci)
        n += 1
    np.asarray(last)
    e2e_s = (time.perf_counter() - t0) / max(n, 1)
    bound = "host" if host_s > dev_s else "device"
    print(f"end-to-end: {e2e_s*1e3:.0f} ms/clip ({CLIP/e2e_s:.0f} frames/s) "
          f"— {bound}-bound (overlap efficiency "
          f"{max(host_s, dev_s)/e2e_s:.2f})", flush=True)
    clip_bytes = CLIP * H * W * 3  # uint8 H2D per clip
    print(f"h2d: {clip_bytes/e2e_s/1e9:.2f} GB/s effective "
          f"({clip_bytes/1e6:.0f} MB/clip); host cores: {os.cpu_count()} "
          "(decode/resize threads scale with cores — this image has 1, so "
          "the host side here is its serial floor)", flush=True)


if __name__ == "__main__":
    main()
