"""Validation: loss epochs and full video generation with quality metrics.

Re-design of `/root/reference/ltx_video/validation.py:14-276`:
- ``validate_epoch`` lives in avatar_tpu.train.train (validate_step_fn) —
  the same noising/velocity-MSE as the train step, no gradients.
- ``validate_video`` runs the full generation pipeline per validation
  sample (vid2vid from the stored latents, ref/pose conditioning from the
  paired latents — replacing the reference's monkey-patched audio-latent
  encode_prompt, a remnant of the earlier conditioning design), writes the
  reconstruction video, and computes per-frame LPIPS + FID against the
  target clip when the metric packages are importable (`lpips`,
  `torchmetrics` — optional; skipped with a warning otherwise).
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _try_load_metrics(device: str = "cpu"):
    """Returns (lpips_metric, fid_metric) or (None, None) when unavailable."""
    try:
        import torch
        from lpips import LPIPS
        from torchmetrics.image.fid import FrechetInceptionDistance

        return (
            LPIPS(net="vgg").to(device).eval(),
            FrechetInceptionDistance(normalize=True).to(device),
        )
    except ImportError:
        warnings.warn(
            "lpips/torchmetrics not installed — validate_video will skip "
            "LPIPS/FID and only write reconstruction videos."
        )
        return None, None


def compute_lpips_fid(
    recon: np.ndarray,  # [F, H, W, 3] uint8
    target: np.ndarray,  # [F, H, W, 3] uint8
    lpips_metric,
    fid_metric,
) -> Dict[str, float]:
    """Per-frame LPIPS average + FID over frames (validation.py:236-270)."""
    import torch

    h = min(target.shape[1], recon.shape[1])
    w = min(target.shape[2], recon.shape[2])
    target, recon = target[:, :h, :w], recon[:, :h, :w]
    n = min(target.shape[0], recon.shape[0])

    lpips_vals = []
    for i in range(n):
        a = torch.from_numpy(recon[i]).permute(2, 0, 1)[None].float() / 255.0
        b = torch.from_numpy(target[i]).permute(2, 0, 1)[None].float() / 255.0
        lpips_vals.append(float(lpips_metric(a * 2 - 1, b * 2 - 1).item()))

    recon_t = torch.from_numpy(recon[:n]).permute(0, 3, 1, 2).float() / 255.0
    tgt_t = torch.from_numpy(target[:n]).permute(0, 3, 1, 2).float() / 255.0
    fid_metric.update(recon_t, real=False)
    fid_metric.update(tgt_t, real=True)
    return {
        "lpips": sum(lpips_vals) / max(1, len(lpips_vals)),
        "fid": float(fid_metric.compute().item()),
    }


def validate_video(
    pipeline,  # LTXVideoPipeline with the current (merged) weights
    val_dataset,
    output_dir: str,
    prompt_embeds: jnp.ndarray,
    prompt_attention_mask: jnp.ndarray,
    videos_dir: Optional[str] = None,  # target clips for metrics
    num_samples: int = 4,
    frame_rate: int = 22,
    num_inference_steps: int = 40,
    key: Optional[jax.Array] = None,
) -> List[Dict]:
    """Generate reconstructions for N validation samples; optional metrics."""
    from avatar_tpu.data.media import read_video_frames, write_video
    from avatar_tpu.pipelines import GenerationParams

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    lpips_metric, fid_metric = _try_load_metrics()

    results = []
    for idx in range(min(num_samples, len(val_dataset))):
        item = val_dataset[idx]
        stem = item["stem"]
        latents = jnp.asarray(item["latents"])[None]  # [1, F, H, W, C]
        pose = jnp.asarray(item["pose_latents"])[None]
        ref = jnp.asarray(item["ref_image_latents"])[None]

        f_l, h_l, w_l = latents.shape[1:4]
        height = h_l * pipeline.vae_scale_factor
        width = w_l * pipeline.vae_scale_factor
        num_frames = (f_l - 1) * pipeline.video_scale_factor

        params = GenerationParams(
            height=height, width=width, num_frames=num_frames,
            frame_rate=frame_rate, num_inference_steps=num_inference_steps,
            guidance_scale=1.0, stg_scale=0.0, rescaling_scale=1.0,
            decode_timestep=0.05,
        )
        key, k_run = jax.random.split(key)
        # ref/pose conditioning comes pre-encoded: inject latents directly
        images = pipeline(
            params, k_run, prompt_embeds, prompt_attention_mask,
            ref_latents=ref, pose_latents=pose,
        )
        recon = (np.clip(np.asarray(images[0]), 0, 1) * 255).astype(np.uint8)

        out_path = out / f"val_recon_{stem}.mp4"
        write_video(out_path, recon / 255.0, fps=frame_rate)

        record = {"stem": stem, "video": str(out_path)}
        target_path = (
            Path(videos_dir) / f"{stem}.mp4" if videos_dir else None
        )
        if (
            lpips_metric is not None
            and target_path is not None
            and target_path.exists()
        ):
            target = np.stack(list(read_video_frames(target_path)), axis=0)
            record.update(
                compute_lpips_fid(recon, target, lpips_metric, fid_metric)
            )
            print(
                f"[val video] {stem}: lpips={record['lpips']:.4f}, "
                f"fid={record['fid']:.4f}, saved={out_path}"
            )
        else:
            print(f"[val video] {stem}: saved={out_path} (metrics skipped)")
        results.append(record)
    return results
