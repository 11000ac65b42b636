"""Two-pass multi-scale generation (reference ``LTXMultiScalePipeline``,
`/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:1916-1990`):
low-res pass -> latent-space 2x upsample -> AdaIN to first-pass statistics
-> high-res refinement pass -> bilinear resize to the requested size.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from avatar_tpu.models.latent_upsampler import (
    LatentUpsamplerConfig,
    latent_upsampler_apply,
)
from avatar_tpu.models.vae import normalize_latents, un_normalize_latents
from avatar_tpu.pipelines.pipeline import (
    GenerationParams,
    LTXVideoPipeline,
    adain_filter_latent,
)


class LTXMultiScalePipeline:
    def __init__(
        self,
        video_pipeline: LTXVideoPipeline,
        upsampler_cfg: LatentUpsamplerConfig,
        upsampler_params: dict,
    ):
        self.video_pipeline = video_pipeline
        self.upsampler_cfg = upsampler_cfg
        self.upsampler_params = upsampler_params
        self._upsample = jax.jit(
            lambda p, lat: self._upsample_impl(p, lat)
        )

    def _upsample_impl(self, upsampler_params, latents):
        vae = self.video_pipeline
        lat = un_normalize_latents(
            latents, vae.vae_params, vae.vae_cfg, per_channel=True
        )
        up = latent_upsampler_apply(upsampler_params, self.upsampler_cfg, lat)
        return normalize_latents(up, vae.vae_params, vae.vae_cfg, per_channel=True)

    def __call__(
        self,
        params: GenerationParams,
        key: jax.Array,
        *args,
        downscale_factor: float = 2.0 / 3,
        first_pass: Optional[dict] = None,
        second_pass: Optional[dict] = None,
        output_type: str = "np",
        **kwargs,
    ):
        vp = self.video_pipeline
        sf = vp.vae_scale_factor
        orig_w, orig_h = params.width, params.height

        down_w = int(orig_w * downscale_factor)
        down_w -= down_w % sf
        down_h = int(orig_h * downscale_factor)
        down_h -= down_h % sf

        def sized_kwargs(h, w):
            # avatar conditioning media must match each pass's generation
            # size (the in-transformer lerp is per latent pixel) — resize as
            # the reference does for conditioning items
            # (pipeline_ltx_video.py:1684-1698 _resize_conditioning_item)
            kw = dict(kwargs)
            for name in ("ref_image", "pose_frames"):
                media = kw.get(name)
                if media is not None and media.shape[2:4] != (h, w):
                    b, f = media.shape[:2]
                    kw[name] = jax.image.resize(
                        media, (b, f, h, w, media.shape[-1]),
                        method="bilinear",
                    ).astype(media.dtype)
            return kw

        k1, k2 = jax.random.split(key)
        p1 = dataclasses.replace(
            params, width=down_w, height=down_h, **(first_pass or {})
        )
        latents = vp(p1, k1, *args, output_type="latent",
                     **sized_kwargs(down_h, down_w))

        upsampled = self._upsample(self.upsampler_params, latents)
        upsampled = adain_filter_latent(upsampled, latents)

        p2 = dataclasses.replace(
            params, width=down_w * 2, height=down_h * 2, **(second_pass or {})
        )
        # resize happens in float; quantize after when uint8 was requested
        inner_output = "np" if output_type == "uint8" else output_type
        result = vp(
            p2, k2, *args, latents=upsampled, output_type=inner_output,
            **sized_kwargs(down_h * 2, down_w * 2)
        )
        if output_type == "latent":
            return result

        # bilinear resize to the requested resolution ([B, F, H, W, 3])
        b, f, h, w, c = result.shape
        if (h, w) != (orig_h, orig_w):
            result = jax.image.resize(
                result, (b, f, orig_h, orig_w, c), method="bilinear"
            )
        if output_type == "uint8":
            result = (jnp.clip(result, 0, 1) * 255.0 + 0.5).astype(jnp.uint8)
        return result
