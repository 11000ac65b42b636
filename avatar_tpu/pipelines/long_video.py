"""Long-video generation by windowed denoising with pixel-space handoff.

The reference generates fixed-length clips only — its token budget caps a
single denoise at ~161 frames (`/root/reference/ltx_video/pipelines/
pipeline_ltx_video.py:722-766` takes one `num_frames`), and it ships no
mechanism to continue a clip. avatar_tpu adds one: split the target video
into overlapping windows, generate each window with the standard pipeline,
and condition every window after the first on the decoded tail of the
previous one through the pipeline's own frame-0 conditioning path
(`prepare_conditioning`, pipeline_ltx_video.py:1381-1585 parity) — the same
machinery a user drives manually for video extension, automated and
stitched.

Mechanics per window ``i > 0``:

- the last ``overlap_frames`` decoded pixel frames of window ``i-1`` become
  a ``ConditioningItem(media_frame_number=0, strength=handoff_strength)``;
  the causal VAE re-encodes them as a fresh first segment, so the frozen
  region is exactly representable (a latent-space splice is NOT: a
  mid-stream latent frame re-interpreted as a causal first frame decodes
  differently, leaving a seam at every stitch).
- window latents can optionally be AdaIN-matched to window 0's statistics
  (``adain_anchor``) — the anti-drift filter multi-scale generation already
  uses between passes (`adain_filter_latent`).
- stitching crossfades the regenerated overlap into the previous window's
  tail with linear weights (``blend_overlap``), so residual mismatch is
  spread over ``overlap_frames`` instead of landing on one seam.

Token cost stays flat per window (the attention sequence never exceeds the
window's), so total cost is linear in video length with a
``window/(window-overlap)`` constant — on TPU this preserves the
fixed-shape, one-compile denoise loop: every window reuses the SAME jitted
denoiser (same latent shape, same schedule), so n windows pay one compile.

Frame-count grammar (causal VAE, temporal factor 8): ``window_frames`` and
``overlap_frames`` must be ``% 8 == 1`` (pipeline num_frames / conditioning
media constraints); the stride ``window - overlap`` is then a multiple of 8
and windows tile the timeline exactly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.pipelines.pipeline import (
    ConditioningItem,
    GenerationParams,
    LTXVideoPipeline,
    adain_filter_latent,
)


@dataclass
class LongVideoParams:
    """Windowing knobs for :func:`generate_long_video`.

    num_frames: total pixel frames to emit (any positive int; windows are
        generated whole and the output is trimmed).
    window_frames: frames per window (% 8 == 1, e.g. 97); must not exceed
        what a single pipeline call supports.
    overlap_frames: pixel frames of handoff context between consecutive
        windows (% 8 == 1, < window_frames). More overlap = smoother
        seams, more recompute.
    handoff_strength: conditioning strength of the previous-window tail
        (1.0 freezes it; <1 lets the model re-imagine it slightly).
    blend_overlap: linearly crossfade the regenerated overlap into the
        previous window's tail instead of keeping the old frames verbatim.
    adain_anchor: AdaIN every later window's latents to window 0's
        per-channel statistics before decode (anti color/contrast drift).
    """

    num_frames: int
    window_frames: int = 97
    overlap_frames: int = 9
    handoff_strength: float = 1.0
    blend_overlap: bool = True
    adain_anchor: bool = False

    def __post_init__(self):
        if self.window_frames % 8 != 1:
            raise ValueError(
                f"window_frames must be % 8 == 1, got {self.window_frames}"
            )
        if self.overlap_frames % 8 != 1:
            raise ValueError(
                f"overlap_frames must be % 8 == 1, got {self.overlap_frames}"
            )
        if not 0 < self.overlap_frames < self.window_frames:
            raise ValueError(
                f"overlap_frames must be in (0, window_frames), got "
                f"{self.overlap_frames} vs {self.window_frames}"
            )
        if self.num_frames < 1:
            raise ValueError(f"num_frames must be >= 1, got {self.num_frames}")


def window_starts(total: int, window: int, overlap: int) -> List[int]:
    """Start frames of each window covering ``total`` frames."""
    if total <= window:
        return [0]
    stride = window - overlap
    n = 1 + int(np.ceil((total - window) / stride))
    return [i * stride for i in range(n)]


def _slice_pose(pose: np.ndarray, start: int, frames: int) -> np.ndarray:
    """[B, F, H, W, 3] pixel pose slice for one window, last-frame padded
    when the driving sequence runs short of the final window."""
    end = start + frames
    f = pose.shape[1]
    if end <= f:
        return pose[:, start:end]
    body = pose[:, start:f]
    pad = jnp.repeat(pose[:, f - 1 : f], end - f, axis=1)
    return jnp.concatenate([body, pad], axis=1)


def generate_long_video(
    pipeline: LTXVideoPipeline,
    params: GenerationParams,
    long: LongVideoParams,
    key: jax.Array,
    prompt_embeds: jnp.ndarray,
    prompt_attention_mask: jnp.ndarray,
    *,
    negative_prompt_embeds: Optional[jnp.ndarray] = None,
    negative_prompt_attention_mask: Optional[jnp.ndarray] = None,
    conditioning_items: Optional[List[ConditioningItem]] = None,
    ref_image: Optional[jnp.ndarray] = None,
    pose_frames: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    output_type: str = "np",  # "np" ([0,1] f32) | "uint8"
    dtype=jnp.bfloat16,
) -> np.ndarray:
    """Generate ``long.num_frames`` frames as overlapping windows.

    ``params.num_frames`` is ignored (each window runs at
    ``long.window_frames``); user ``conditioning_items`` apply to the first
    window only (they address absolute frames 0..window). ``pose_frames``
    spans the WHOLE video and is sliced per window (short sequences are
    last-frame padded). Returns host frames [B, num_frames, H, W, 3] —
    f32 in [0, 1] for ``output_type="np"``, uint8 for ``"uint8"``.
    """
    if output_type not in ("np", "uint8"):
        raise ValueError(
            f"long video stitches on host: output_type must be 'np' or "
            f"'uint8', got {output_type!r}"
        )
    W, V, T = long.window_frames, long.overlap_frames, long.num_frames
    starts = window_starts(T, W, V)
    p_win = dataclasses.replace(params, num_frames=W)

    ref_lat = None
    if ref_image is not None:
        # encode the avatar reference once; every window reuses it
        k_ref, key = jax.random.split(key)
        ref_lat = pipeline.encode_media(
            ref_image.astype(dtype), k_ref, p_win.vae_per_channel_normalize
        )

    anchor_latents = None
    out = None  # host [B, total_covered, H, W, 3] f32 in [0, 1]
    for i, s in enumerate(starts):
        k_win = jax.random.fold_in(key, i)
        cond = conditioning_items if i == 0 else [
            ConditioningItem(
                media_item=jnp.asarray(out[:, s : s + V] * 2.0 - 1.0),
                media_frame_number=0,
                conditioning_strength=long.handoff_strength,
            )
        ]
        pose_win = (
            None if pose_frames is None else _slice_pose(pose_frames, s, W)
        )
        latents = pipeline(
            p_win, k_win, prompt_embeds, prompt_attention_mask,
            negative_prompt_embeds=negative_prompt_embeds,
            negative_prompt_attention_mask=negative_prompt_attention_mask,
            conditioning_items=cond,
            ref_image=None, ref_latents=ref_lat,
            pose_frames=pose_win,
            lora=lora, output_type="latent", dtype=dtype,
        )
        if long.adain_anchor:
            if anchor_latents is None:
                anchor_latents = latents
            else:
                latents = adain_filter_latent(latents, anchor_latents)
        frames = np.asarray(
            pipeline.decode_latents(
                latents, p_win, key=jax.random.fold_in(k_win, 7),
                output_type="np",
            ),
            dtype=np.float32,
        )
        if i == 0:
            b, _, h, w, c = frames.shape
            total = starts[-1] + W
            out = np.zeros((b, total, h, w, c), np.float32)
            out[:, :W] = frames
        else:
            if long.blend_overlap:
                # linear crossfade: old tail keeps full weight at its first
                # overlap frame, the regenerated window takes over by the
                # last — the handoff-frozen region makes both near-equal,
                # so the ramp only spreads the residual
                wgt = np.linspace(0.0, 1.0, V, dtype=np.float32)
                wgt = wgt.reshape(1, V, 1, 1, 1)
                out[:, s : s + V] = (
                    (1.0 - wgt) * out[:, s : s + V] + wgt * frames[:, :V]
                )
            out[:, s + V : s + W] = frames[:, V:]

    out = out[:, :T]
    if output_type == "uint8":
        return (out * 255.0 + 0.5).astype(np.uint8)
    return out
