"""End-to-end LTX-Video generation pipeline, TPU-native.

Re-design of ``LTXVideoPipeline``
(`/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:209-1990`) around
XLA's compilation model:

- The whole denoising walk is ONE jit-compiled ``lax.fori_loop`` — per-step
  guidance / STG / rescale values are arrays indexed by the step counter, so
  nothing recompiles across steps (the reference warns its loop recompiles
  when scales change shape, pipeline_ltx_video.py:1084-1087; here the batch
  layout is static by construction).
- ``num_conds`` (1-3: [uncond, text, text-perturbed]) is fixed for the whole
  run from the *maximum* guidance requirements, matching the reference's own
  advice for compiled execution.
- Avatar conditioning (reference image + pose frames) is the in-transformer
  lerp (transformer3d.py:447-466) applied every step via
  :func:`avatar_condition_tokens`; the generic ``ConditioningItem`` path
  (first-frame/sequence lerp + extra conditioning tokens,
  pipeline_ltx_video.py:1381-1585) is also implemented.
- VAE decode (with decode-time noise + tone mapping) is a second jitted fn.

The reference's bug of passing raw tensors as ``conditioning_items`` in the
avatar flow (inference.py:456-477 vs pipeline prepare_conditioning) is fixed
by the intended behavior: avatar runs condition via ref/pose only.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.diffusion.rf import (
    RectifiedFlowSchedule,
    rf_step,
)
from avatar_tpu.models.dit import (
    DiTConfig,
    SkipLayerStrategy,
    avatar_condition_tokens,
    create_skip_layer_mask,
    dit_apply,
    permute_dit_params_for_split_rope,
    precompute_cross_attention_kv,
)
from avatar_tpu.models.patchifier import patchify, unpatchify
from avatar_tpu.models.vae import (
    VAEConfig,
    vae_decode,
    vae_encode,
)
from avatar_tpu.ops.rope import latent_to_pixel_coords

T_EPS = 1e-6


@dataclass
class ConditioningItem:
    """A frame/sequence conditioning item (pipeline_ltx_video.py:189-206).

    media_item: [B, F, H, W, 3] channels-last pixels in [-1, 1].
    """

    media_item: jnp.ndarray
    media_frame_number: int = 0
    conditioning_strength: float = 1.0
    media_x: Optional[int] = None
    media_y: Optional[int] = None


@dataclass
class GenerationParams:
    """Static-ish knobs of one generation run (the pipeline __call__
    signature, pipeline_ltx_video.py:722-766)."""

    height: int
    width: int
    num_frames: int
    frame_rate: float = 25.0
    num_inference_steps: int = 20
    skip_initial_inference_steps: int = 0
    skip_final_inference_steps: int = 0
    guidance_scale: Union[float, List[float]] = 4.5
    stg_scale: Union[float, List[float]] = 1.0
    rescaling_scale: Union[float, List[float]] = 0.7
    guidance_timesteps: Optional[List[float]] = None
    cfg_star_rescale: bool = False
    skip_layer_strategy: Optional[SkipLayerStrategy] = None
    # flat list, or list-of-lists mapped per-step through
    # guidance_timesteps (pipeline_ltx_video.py:975-984)
    skip_block_list: Optional[Union[List[int], List[List[int]]]] = None
    decode_timestep: Union[float, List[float]] = 0.0
    decode_noise_scale: Optional[Union[float, List[float]]] = None
    tone_map_compression_ratio: float = 0.0
    stochastic_sampling: bool = False
    image_cond_noise_scale: float = 0.0
    is_video: bool = True
    vae_per_channel_normalize: bool = True
    # ODE solver for the denoising walk. "euler" is the reference's update
    # (rf.py:305-374). "heun" is a 2nd-order predictor-corrector over the
    # SAME rectified-flow ODE: two velocity evals per schedule step (the
    # final step to sigma 0 stays Euler, the EDM convention), so heun @ N
    # costs euler @ 2N-1 NFE with O(h^2) global error on smooth (trained)
    # velocity fields. tests/test_solver.py pins the order in closed form
    # through rf_step composition and ODE-consistency on the model. Use it
    # to cut num_inference_steps (e.g. 40 -> 20) at roughly equal NFE.
    solver: str = "euler"


def tone_map_latents(latents: jnp.ndarray, compression: float) -> jnp.ndarray:
    """Sigmoid dynamic-range compression (pipeline_ltx_video.py:1843-1882)."""
    if not 0 <= compression <= 1:
        raise ValueError("Compression must be in the range [0, 1]")
    if compression == 0.0:
        return latents
    scale_factor = compression * 0.75
    abs_latents = jnp.abs(latents)
    sigmoid_term = jax.nn.sigmoid(4.0 * scale_factor * (abs_latents - 1.0))
    scales = 1.0 - 0.8 * scale_factor * sigmoid_term
    return latents * scales


def adain_filter_latent(
    latents: jnp.ndarray, reference_latents: jnp.ndarray, factor: float = 1.0
) -> jnp.ndarray:
    """Per-(batch, channel) AdaIN toward reference statistics
    (pipeline_ltx_video.py:1885-1913). Channels-last: stats over (F, H, W)."""
    axes = (1, 2, 3)
    r_mean = jnp.mean(reference_latents, axis=axes, keepdims=True)
    r_std = jnp.std(reference_latents, axis=axes, keepdims=True, ddof=1)
    i_mean = jnp.mean(latents, axis=axes, keepdims=True)
    i_std = jnp.std(latents, axis=axes, keepdims=True, ddof=1)
    result = ((latents - i_mean) / i_std) * r_std + r_mean
    return latents + factor * (result - latents)


def _guidance_mapping(
    timesteps: np.ndarray, guidance_timesteps: List[float]
) -> List[int]:
    """Index of the guidance entry applying at each actual schedule step
    (pipeline_ltx_video.py:946-955)."""
    mapping = []
    for t in timesteps:
        indices = [i for i, v in enumerate(guidance_timesteps) if v <= t]
        mapping.append(indices[0] if indices else len(guidance_timesteps) - 1)
    return mapping


def _as_step_array(
    value: Union[float, List[float]],
    timesteps: np.ndarray,
    guidance_timesteps: Optional[List[float]],
) -> np.ndarray:
    """Broadcast a scalar or map a per-guidance-timestep list onto the actual
    schedule (pipeline_ltx_video.py:946-984)."""
    if not isinstance(value, (list, tuple)):
        return np.full(len(timesteps), float(value), dtype=np.float32)
    assert guidance_timesteps is not None, (
        "list-valued guidance requires guidance_timesteps"
    )
    mapping = _guidance_mapping(timesteps, guidance_timesteps)
    return np.asarray([value[m] for m in mapping], dtype=np.float32)


class LTXVideoPipeline:
    """Orchestrates schedule prep (host), conditioning (jitted VAE encodes),
    one jitted denoising loop, and jitted decode."""

    def __init__(
        self,
        dit_cfg: DiTConfig,
        dit_params: dict,
        vae_cfg: VAEConfig,
        vae_params: dict,
        schedule: Optional[RectifiedFlowSchedule] = None,
        text_encoder=None,
        patch_size: int = 1,
        attention_impl: str = "auto",
        allowed_inference_steps: Optional[List[float]] = None,
        quantize_weights: Union[bool, str] = False,
        quantize_vae: Union[bool, str] = False,
        rope_split: bool = True,
        sp_mesh=None,
        sp_axis: str = "sp",
        sp_impl: str = "ulysses",
        dp_mesh=None,
        dp_axis: str = "data",
        pp_mesh=None,
        pp_axis: str = "pp",
        pp_microbatches: Optional[int] = None,
        scan_blocks: bool = False,
    ):
        self.dit_cfg = dit_cfg
        # On a remote-tunneled device, the init-time param transforms below
        # (quantization, split-RoPE permute) would each dispatch hundreds of
        # small eager ops (~2 min of round-trips for the 2B tree); one jit
        # turns each into a single compiled dispatch. On CPU the eager path
        # is fine and keeps test startup flat.
        _one_shot = (
            jax.jit if jax.default_backend() != "cpu" else (lambda f: f)
        )
        if quantize_weights:
            # True / "w8": weight-only int8 (memory). "w8a8": int8 MXU
            # matmuls with dynamic per-token activation quant (speed) —
            # see utils/quantize.py.
            from avatar_tpu.utils.quantize import quantize_dit_params

            mode = "w8" if quantize_weights is True else quantize_weights
            dit_params = _one_shot(
                functools.partial(quantize_dit_params, mode=mode)
            )(dit_params)
        if quantize_vae:
            # int8 MXU convs for VAE encode/decode (~1.6x conv throughput
            # on v5e); opt-in — the final pixels pass through quantized
            # convs, so fidelity-critical runs should leave this off.
            from avatar_tpu.utils.quantize import quantize_vae_params

            vae_params = _one_shot(quantize_vae_params)(vae_params)
        # split-RoPE layout: q/k projection columns permuted once at init so
        # the per-step RoPE is contiguous-slice math (no stride-2 gather,
        # ~1.1 ms/step on v5e at the 97f/256px operating point).
        # raw_dit_params keeps the UNPERMUTED tree: seeding a second
        # pipeline from self.dit_params would permute twice and silently
        # corrupt attention (only the q/k copies cost extra memory).
        self.rope_split = rope_split
        self.raw_dit_params = dit_params
        if rope_split:
            # jit_wrap applies only to the q/k subtree: the other ~75% of
            # the params are shared by reference between raw_dit_params and
            # dit_params instead of duplicated in HBM (ADVICE r2 item 4).
            dit_params = permute_dit_params_for_split_rope(
                dit_params, dit_cfg, jit_wrap=_one_shot,
            )
        # Pipeline parallelism: transformer blocks stacked on a leading
        # layer axis and stage-sharded over `pp_mesh[pp_axis]`; each chip
        # holds num_layers/S blocks and microbatches stream via ppermute
        # (parallel/pipeline.py). For DiT variants too deep for one chip's
        # HBM. Mutually exclusive with sp/dp (compose pp with a 'data' axis
        # inside pp_mesh instead).
        self.pp_mesh = pp_mesh
        self.pp_axis = pp_axis
        self.pp_microbatches = pp_microbatches
        if pp_mesh is not None:
            assert sp_mesh is None and dp_mesh is None, (
                "pp_mesh composes with a 'data' axis in the same mesh, not "
                "with sp_mesh/dp_mesh"
            )
            from avatar_tpu.parallel.pipeline import (
                pp_param_sharding,
                stack_block_params,
            )

            dit_params = dict(
                dit_params, blocks=stack_block_params(dit_params["blocks"])
            )
            dit_params = jax.tree.map(
                jax.device_put, dit_params,
                pp_param_sharding(pp_mesh, dit_params, axis=pp_axis),
            )
        # scan_blocks: stack the transformer blocks on a leading [L, ...]
        # layer axis so dit_apply runs them as ONE lax.scan body — cold
        # compile becomes depth-independent (575 s -> 23 s for the 28-block
        # 512px program on v5e) at ~+1.4% step time from per-iteration
        # param slices. For deployments where cold-start latency on new
        # shapes matters more than the last % of step time (autoscaling,
        # multi-resolution serving). Stacked AFTER the quantize/split-RoPE
        # transforms so the leaves carry the final layout; bit-matches the
        # unrolled path (tests/test_dit.py, tests/test_pipeline.py).
        self.scan_blocks = scan_blocks
        if scan_blocks and pp_mesh is None:
            from avatar_tpu.parallel.pipeline import stack_block_params

            assert sp_mesh is None, (
                "scan_blocks composes with dp_mesh but not sp_mesh (the "
                "sequence-parallel denoiser manages its own block schedule)"
            )
            dit_params = dict(
                dit_params,
                blocks=_one_shot(stack_block_params)(dit_params["blocks"]),
            )
        self.dit_params = dit_params
        self.vae_cfg = vae_cfg
        self.vae_params = vae_params
        self.schedule = schedule or RectifiedFlowSchedule.create(
            sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
        )
        self.text_encoder = text_encoder
        self.patch_size = patch_size
        self.attention_impl = attention_impl
        # Sequence parallelism: shard the token axis of the denoiser over
        # `sp_mesh[sp_axis]` — "ulysses" (all-to-all, needs heads % s == 0)
        # or "ring" (ppermute kv rotation, no head limit);
        # parallel/sequence.py.
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis
        self.sp_impl = sp_impl
        # Data parallelism: shard the batch (sample) axis of every encode /
        # denoise / decode over `dp_mesh[dp_axis]` — multi-chip throughput
        # serving with zero per-step collectives (each sample is
        # independent; XLA just runs B/ndev samples per chip). Params stay
        # replicated. Batch must be a multiple of the axis size (the
        # serving layer pads; pipelines assert).
        self.dp_mesh = dp_mesh
        self.dp_axis = dp_axis
        self.allowed_inference_steps = allowed_inference_steps
        self.video_scale_factor = vae_cfg.temporal_downscale_factor
        self.vae_scale_factor = vae_cfg.spatial_downscale_factor
        self._denoise_cache: Dict[Any, Any] = {}
        self._encode_fn = jax.jit(
            lambda p, x, key, pcn: vae_encode(
                p, self.vae_cfg, x, key=key, sample_posterior=True,
                per_channel_normalize=pcn,
            ),
            static_argnames=("pcn",),
        )
        self._decode_fn = jax.jit(
            functools.partial(self._decode_impl),
            static_argnames=(
                "tone_map", "pcn", "timestep_conditioning", "output_type",
            ),
        )

    # -- data parallelism --------------------------------------------------

    def _mesh_ctx(self):
        """Ambient-mesh context for jit dispatch under data parallelism.

        Pallas kernels partition over the batch only when an ambient mesh
        is installed at trace time (ops/flash_attention._ambient_kernel_mesh
        wraps them in shard_map); without this, the dp pipeline's attention
        custom calls would be replicated by SPMD — every chip all-gathering
        the full batch."""
        import contextlib

        return self.dp_mesh if self.dp_mesh is not None else (
            contextlib.nullcontext()
        )

    def _dp_put(self, *arrays):
        """Commit arrays with the batch (axis 0) sharded over the dp mesh.

        Arrays whose leading dim isn't a multiple of the axis size (e.g.
        schedule vectors) are left untouched — they ride along replicated.
        Returns the arrays in order (singletons unwrapped by the caller).
        """
        if self.dp_mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        ndev = self.dp_mesh.shape[self.dp_axis]
        outs = []
        for a in arrays:
            if (
                a is not None
                and hasattr(a, "ndim")
                and a.ndim > 0
                and a.shape[0] % ndev == 0
            ):
                spec = [None] * a.ndim
                spec[0] = self.dp_axis
                outs.append(
                    jax.device_put(
                        a,
                        jax.sharding.NamedSharding(
                            self.dp_mesh,
                            jax.sharding.PartitionSpec(*spec),
                        ),
                    )
                )
            else:
                outs.append(a)
        return tuple(outs) if len(outs) > 1 else outs[0]

    # -- VAE helpers -----------------------------------------------------

    def encode_media(
        self, media: jnp.ndarray, key: jax.Array, per_channel_normalize: bool = True
    ) -> jnp.ndarray:
        with self._mesh_ctx():
            return self._encode_fn(
                self.vae_params, media, key, per_channel_normalize
            )

    def _decode_impl(
        self, vae_params, latents, decode_timestep, decode_noise_scale, key,
        tone_map: float, pcn: bool, timestep_conditioning: bool,
        output_type: str = "np",
    ):
        if timestep_conditioning:
            noise = jax.random.normal(key, latents.shape, dtype=latents.dtype)
            scale = decode_noise_scale.reshape(-1, 1, 1, 1, 1).astype(latents.dtype)
            latents = latents * (1 - scale) + noise * scale
        latents = tone_map_latents(latents, tone_map)
        images = vae_decode(
            vae_params, self.vae_cfg, latents,
            timestep=decode_timestep if timestep_conditioning else None,
            per_channel_normalize=pcn,
        )
        # postprocess inside the decode jit: the [-1,1] -> [0,1] map and the
        # uint8 / I420 output quantization fuse into the decoder's last conv
        # instead of running as eager full-res passes with per-op dispatch
        # (VaeImageProcessor.postprocess equivalent, inference.py output path)
        images = jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)
        if output_type == "uint8":
            # device-side quantization: 4x smaller host transfer
            images = (images * 255.0 + 0.5).astype(jnp.uint8)
        elif output_type == "yuv420":
            # device-side I420: 8x smaller transfer than f32 RGB, and the
            # planar layout video muxers consume directly (ops/color.py)
            from avatar_tpu.ops.color import rgb_to_yuv420

            images = rgb_to_yuv420(images)
        return images

    # -- Conditioning ----------------------------------------------------

    def prepare_latents(
        self,
        key: jax.Array,
        latent_shape: Tuple[int, int, int, int, int],  # [B, F, H, W, C]
        dtype,
        latents: Optional[jnp.ndarray] = None,
        media_items: Optional[jnp.ndarray] = None,
        timestep: float = 1.0,
        vae_per_channel_normalize: bool = True,
        sample_keys: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """pipeline_ltx_video.py:592-670 (noise, or media noised to t0).

        ``sample_keys``: optional [B] explicit per-sample PRNG keys — a
        serving layer passes per-request keys so a request's initial noise
        is independent of which batch it landed in."""
        assert latents is None or media_items is None
        if media_items is not None:
            k_enc, key = jax.random.split(key)
            latents = self.encode_media(
                media_items.astype(dtype), k_enc, vae_per_channel_normalize
            )
        # Per-sample noise keys: the same sample index draws the same noise
        # regardless of batch composition (gives the batch-determinism
        # property the reference tests assert, tests/test_inference.py:106-158).
        if sample_keys is None:
            sample_keys = jax.random.split(key, latent_shape[0])
        noise = jax.vmap(
            lambda k: jax.random.normal(k, latent_shape[1:], dtype=dtype)
        )(sample_keys)
        if latents is None:
            return noise
        assert latents.shape == latent_shape, (latents.shape, latent_shape)
        return timestep * noise + (1 - timestep) * latents.astype(dtype)

    def prepare_conditioning(
        self,
        conditioning_items: Optional[List[ConditioningItem]],
        init_latents: jnp.ndarray,  # [B, F, H, W, C]
        key: jax.Array,
        vae_per_channel_normalize: bool = True,
    ):
        """Generic ConditioningItem path (pipeline_ltx_video.py:1381-1585).

        Returns (tokens [B,N,C], pixel_coords [B,3,N], conditioning_mask
        [B,N] or None, num_cond_latents).
        """
        b, f_l, h_l, w_l, c_l = init_latents.shape
        causal_fix = False  # causal_temporal_positioning defaults False
        scale_factors = (
            self.video_scale_factor, self.vae_scale_factor, self.vae_scale_factor
        )

        if not conditioning_items:
            tokens, coords = patchify(init_latents, self.patch_size)
            pixel_coords = latent_to_pixel_coords(coords, scale_factors, causal_fix)
            return tokens, pixel_coords, None, 0

        init_mask = jnp.zeros((b, f_l, h_l, w_l), dtype=jnp.float32)
        extra_tokens, extra_coords, extra_masks = [], [], []
        num_extra = 0

        height = h_l * self.vae_scale_factor
        width = w_l * self.vae_scale_factor
        for item in conditioning_items:
            media = item.media_item
            frame_no = item.media_frame_number
            strength = item.conditioning_strength
            has_position = item.media_x is not None or item.media_y is not None
            if not has_position and media.shape[2:4] != (height, width):
                # _resize_conditioning_item (pipeline_ltx_video.py:1684-1698)
                b_m, f_m = media.shape[:2]
                media = jax.image.resize(
                    media, (b_m, f_m, height, width, media.shape[-1]),
                    method="bilinear",
                )
            assert media.ndim == 5 and media.shape[1] % 8 == 1
            k_enc, k_noise, key = jax.random.split(key, 3)
            lat = self.encode_media(media, k_enc, vae_per_channel_normalize).astype(
                init_latents.dtype
            )

            if frame_no == 0:
                # spatial placement + border strip
                # (_get_latent_spatial_position, pipeline_ltx_video.py:1700-1745)
                scale = self.vae_scale_factor
                h_m, w_m = media.shape[2:4]
                assert h_m <= height and w_m <= width
                assert h_m % scale == 0 and w_m % scale == 0
                x_start = (width - w_m) // 2 if item.media_x is None else item.media_x
                y_start = (height - h_m) // 2 if item.media_y is None else item.media_y
                x_end, y_end = x_start + w_m, y_start + h_m
                assert x_end <= width and y_end <= height, (
                    f"conditioning {x_start}:{x_end}x{y_start}:{y_end} out of "
                    f"bounds for {width}x{height}"
                )
                # strip border latents that don't align with target borders
                if x_start > 0:
                    x_start += scale
                    lat = lat[:, :, :, 1:]
                if y_start > 0:
                    y_start += scale
                    lat = lat[:, :, 1:]
                if x_end < width:
                    lat = lat[:, :, :, :-1]
                if y_end < height:
                    lat = lat[:, :, :-1]
                l_x, l_y = x_start // scale, y_start // scale

                fl, hl_m, wl_m = lat.shape[1:4]
                region = init_latents[:, :fl, l_y : l_y + hl_m, l_x : l_x + wl_m]
                updated = region + strength * (lat - region)
                init_latents = init_latents.at[
                    :, :fl, l_y : l_y + hl_m, l_x : l_x + wl_m
                ].set(updated)
                init_mask = init_mask.at[
                    :, :fl, l_y : l_y + hl_m, l_x : l_x + wl_m
                ].set(strength)
            else:
                # Non-first sequence: lerp the non-prefix frames in place,
                # pass the 2-frame prefix on as extra tokens ("concat" mode,
                # pipeline_ltx_video.py:1761-1821).
                if lat.shape[1] > 1:
                    f_l_p = 2
                    assert frame_no % self.video_scale_factor == 0
                    start = frame_no // self.video_scale_factor + f_l_p
                    end = start + lat.shape[1] - f_l_p
                    if lat.shape[1] > f_l_p:
                        upd = init_latents[:, start:end] + strength * (
                            lat[:, f_l_p:] - init_latents[:, start:end]
                        )
                        init_latents = init_latents.at[:, start:end].set(upd)
                        init_mask = init_mask.at[:, start:end].set(strength)
                    lat = lat[:, :f_l_p]
                noise = jax.random.normal(k_noise, lat.shape, dtype=lat.dtype)
                lat = noise + strength * (lat - noise)
                tok, coords = patchify(lat, self.patch_size)
                pix = latent_to_pixel_coords(coords, scale_factors, causal_fix)
                pix = pix.at[:, 0].add(frame_no)
                num_extra += tok.shape[1]
                extra_tokens.append(tok)
                extra_coords.append(pix)
                extra_masks.append(
                    jnp.full(tok.shape[:2], strength, dtype=jnp.float32)
                )

        tokens, coords = patchify(init_latents, self.patch_size)
        pixel_coords = latent_to_pixel_coords(coords, scale_factors, causal_fix)
        mask_tokens, _ = patchify(init_mask[..., None], self.patch_size)
        mask = mask_tokens[..., 0]

        if extra_tokens:
            tokens = jnp.concatenate(extra_tokens + [tokens], axis=1)
            pixel_coords = jnp.concatenate(extra_coords + [pixel_coords], axis=2)
            mask = jnp.concatenate(extra_masks + [mask], axis=1)

        return tokens, pixel_coords, mask, num_extra

    # -- Denoising loop ----------------------------------------------------

    def _get_denoiser(self, statics: tuple):
        if statics in self._denoise_cache:
            return self._denoise_cache[statics]
        (num_conds, do_cfg, do_stg, cfg_star, stochastic, has_cond_mask,
         has_avatar, has_skip_mask, skip_mask_per_step,
         image_cond_noise_scale, skip_strategy, attention_impl,
         solver) = statics
        dit_cfg = self.dit_cfg
        patch_size = self.patch_size
        rope_split = self.rope_split

        def loop(dit_params, lora, latents, init_latents, fractional_coords,
                 prompt_embeds_b, prompt_mask_b, sigmas, guidance, stg,
                 rescale, cond_mask, ref_lat, pose_lat, skip_layer_mask, key):
            b = latents.shape[0]

            if (
                self.pp_mesh is not None
                and lora is not None
                and isinstance(lora["blocks"], list)
            ):
                from avatar_tpu.parallel.pipeline import stack_block_params

                lora = dict(lora, blocks=stack_block_params(lora["blocks"]))

            def tile(x):
                return jnp.concatenate([x] * num_conds) if num_conds > 1 else x

            if has_avatar:
                ref_b, pose_b = tile(ref_lat), tile(pose_lat)

            # Loop-invariant precomputes (once per run, not per step): RoPE
            # frequencies, caption projection, and every block's
            # cross-attention k/v (they depend only on the text context).
            from avatar_tpu.ops.rope import precompute_freqs_cis, split_freqs

            freqs_cis = precompute_freqs_cis(
                fractional_coords, dim=dit_cfg.inner_dim,
                theta=dit_cfg.positional_embedding_theta,
                max_pos=dit_cfg.positional_embedding_max_pos,
                out_dtype=latents.dtype,
            )
            if rope_split:
                freqs_cis = split_freqs(freqs_cis)
            cross_kv, _ = precompute_cross_attention_kv(
                dit_params, dit_cfg, prompt_embeds_b, lora=lora,
                dtype=latents.dtype,
            )
            # next-level lookup for the Heun corrector: the level after the
            # last schedule entry is the terminal sigma 0 (matching
            # rf_step's own timesteps_padded convention)
            sigmas_ext = jnp.concatenate(
                [sigmas, jnp.zeros((1,), sigmas.dtype)]
            )

            # AdaLN timestep embeds for the whole schedule, once: the
            # per-step embedder chain is ~15 small XLA ops whose in-loop
            # fixed costs add up (512px audit, round 5). Only the
            # per-sample-scalar-t path — token-level t (cond mask) depends
            # on the mask and stays in-loop. pp/sp denoisers keep their
            # own prologue.
            timestep_tables = None
            if (not has_cond_mask and self.pp_mesh is None
                    and self.sp_mesh is None):
                from avatar_tpu.models.dit import precompute_timestep_tables

                timestep_tables = precompute_timestep_tables(
                    dit_params, dit_cfg, sigmas_ext,
                    b * num_conds, dtype=latents.dtype,
                )

            def body(i, carry):
                latents, key = carry
                t = sigmas[i]

                if has_cond_mask and image_cond_noise_scale > 0.0:
                    # add_noise_to_image_conditioning_latents
                    # (pipeline_ltx_video.py:566-589)
                    k = jax.random.fold_in(key, 2 * i)
                    noise = jax.random.normal(k, latents.shape, latents.dtype)
                    noise_scale = (image_cond_noise_scale * t**2).astype(
                        latents.dtype
                    )
                    noised = init_latents + noise_scale * noise
                    need = (cond_mask > 1.0 - T_EPS)[..., None]
                    latents = jnp.where(need, noised, latents)

                step_skip_mask = (
                    skip_layer_mask[i] if skip_mask_per_step
                    else skip_layer_mask
                )

                def guided_velocity(lat, t_cur, step_idx):
                    """CFG/STG-combined velocity at noise level t_cur
                    (= sigmas_ext[step_idx]; the index selects the
                    precomputed AdaLN table row when tables are active)."""
                    step_tables = (
                        None if timestep_tables is None
                        else (timestep_tables[0][step_idx],
                              timestep_tables[1][step_idx])
                    )
                    latent_in = tile(lat)
                    if has_cond_mask:
                        token_t = jnp.minimum(t_cur, 1.0 - cond_mask)  # [B, N]
                        current_t = tile(token_t)
                    else:
                        token_t = t_cur
                        current_t = jnp.full(
                            (latent_in.shape[0],), t_cur, dtype=lat.dtype
                        )

                    if has_avatar:
                        latent_in = avatar_condition_tokens(latent_in, ref_b, pose_b)

                    if self.pp_mesh is not None:
                        from avatar_tpu.parallel.pipeline import dit_apply_pp

                        noise_pred = dit_apply_pp(
                            dit_params, dit_cfg, latent_in, fractional_coords,
                            current_t, None, prompt_mask_b,
                            mesh=self.pp_mesh, axis=self.pp_axis,
                            num_microbatches=self.pp_microbatches,
                            data_axis=(
                                "data" if "data" in self.pp_mesh.axis_names
                                else None
                            ),
                            skip_layer_mask=step_skip_mask,
                            skip_layer_strategy=skip_strategy,
                            attention_impl=attention_impl,
                            lora=lora,
                            freqs_cis=freqs_cis,
                            rope_split=rope_split,
                            cross_kv=cross_kv,
                        ).astype(latents.dtype)
                    elif self.sp_mesh is not None:
                        from avatar_tpu.parallel.sequence import dit_apply_sp

                        noise_pred = dit_apply_sp(
                            dit_params, dit_cfg, latent_in, fractional_coords,
                            current_t, None, prompt_mask_b,
                            mesh=self.sp_mesh, axis=self.sp_axis,
                            sp_impl=self.sp_impl,
                            skip_layer_mask=step_skip_mask,
                            skip_layer_strategy=skip_strategy,
                            attention_impl=attention_impl,
                            lora=lora,
                            freqs_cis=freqs_cis,
                            rope_split=rope_split,
                            cross_kv=cross_kv,
                        ).astype(latents.dtype)
                    else:
                        noise_pred = dit_apply(
                            dit_params, dit_cfg, latent_in, fractional_coords,
                            current_t, None, prompt_mask_b,
                            skip_layer_mask=step_skip_mask,
                            skip_layer_strategy=skip_strategy,
                            attention_impl=attention_impl,
                            lora=lora,
                            freqs_cis=freqs_cis,
                            rope_split=rope_split,
                            cross_kv=cross_kv,
                            timestep_tables=step_tables,
                        ).astype(latents.dtype)

                    parts = jnp.split(noise_pred, num_conds, axis=0)
                    if do_cfg and do_stg:
                        uncond, text, ptb = parts
                    elif do_cfg:
                        uncond, text = parts
                        ptb = None
                    elif do_stg:
                        text, ptb = parts
                        uncond = None
                    else:
                        (text,) = parts
                        uncond = ptb = None

                    # per-step scalars are f32 arrays; cast so guidance math
                    # doesn't promote the bf16 carry to f32
                    g = guidance[i].astype(latents.dtype)
                    if do_cfg:
                        if cfg_star:
                            # cfg_star_rescale (pipeline_ltx_video.py:1225-1238)
                            pos = text.reshape(b, -1).astype(jnp.float32)
                            neg = uncond.reshape(b, -1).astype(jnp.float32)
                            alpha = jnp.sum(pos * neg, axis=1, keepdims=True) / (
                                jnp.sum(neg**2, axis=1, keepdims=True) + 1e-8
                            )
                            uncond = (
                                alpha.reshape(b, 1, 1).astype(uncond.dtype) * uncond
                            )
                        pred = uncond + g * (text - uncond)
                    else:
                        pred = text

                    if do_stg:
                        sg = stg[i].astype(latents.dtype)
                        pred = pred + sg * (text - ptb)
                        # rescaling (pipeline_ltx_video.py:1246-1260), applied
                        # when stg>0 and rescale != 1 — dynamic via where
                        rs = rescale[i]
                        text_std = jnp.std(
                            text.reshape(b, -1).astype(jnp.float32), axis=1,
                            keepdims=True, ddof=1,
                        )
                        pred_std = jnp.std(
                            pred.reshape(b, -1).astype(jnp.float32), axis=1,
                            keepdims=True, ddof=1,
                        )
                        factor = rs * (text_std / pred_std) + (1 - rs)
                        apply = (sg > 0.0) & (rs != 1.0)
                        factor = jnp.where(apply, factor, 1.0)
                        pred = pred * factor.reshape(b, 1, 1).astype(pred.dtype)
                    return pred, token_t

                pred, token_t = guided_velocity(latents, t, i)
                if solver == "heun":
                    # Euler predictor to the next schedule level, then a
                    # trapezoidal corrector. rf_step is linear in the
                    # velocity for the deterministic path, so the Heun
                    # update is rf_step on the averaged velocity. Frozen
                    # conditioning tokens are pinned in the predictor
                    # state exactly as in the final update, so the
                    # corrector sees what step i+1 would see. The final
                    # step (to sigma 0) stays plain Euler — the EDM/
                    # k-diffusion convention: the velocity net is never
                    # trained at sigma=0. Blended with `where`, not
                    # lax.cond: the denoiser must stay SPMD-safe when
                    # guided_velocity carries collectives (pp/sp meshes)
                    # or Pallas calls, and the waste is one extra model
                    # eval on the single terminal step.
                    t_next = sigmas_ext[i + 1]
                    x_e = rf_step(sigmas, pred, token_t, latents)
                    if has_cond_mask:
                        keep_e = (t - T_EPS < (1.0 - cond_mask))[..., None]
                        x_e = jnp.where(keep_e, x_e, latents)
                    pred2, _ = guided_velocity(x_e, t_next, i + 1)
                    pred = jnp.where(t_next > 0.0, 0.5 * (pred + pred2), pred)

                k_step = jax.random.fold_in(key, 2 * i + 1)
                denoised = rf_step(
                    sigmas, pred, token_t, latents,
                    stochastic_sampling=stochastic,
                    key=k_step if stochastic else None,
                )
                if has_cond_mask:
                    keep = (t - T_EPS < (1.0 - cond_mask))[..., None]
                    denoised = jnp.where(keep, denoised, latents)
                return (denoised, key)

            latents, _ = jax.lax.fori_loop(
                0, sigmas.shape[0], body, (latents, key)
            )
            return latents

        fn = jax.jit(loop)
        self._denoise_cache[statics] = fn
        return fn

    # -- Main entry ----------------------------------------------------------

    def __call__(self, *args, **kwargs):
        """Generate media; see :meth:`_generate` for the signature.  Runs
        under the dp mesh context so sharded-batch kernel dispatch (and any
        retrace) sees the mesh."""
        with self._mesh_ctx():
            return self._generate(*args, **kwargs)

    def _generate(
        self,
        params: GenerationParams,
        key: jax.Array,
        prompt_embeds: jnp.ndarray,  # [B, L, caption_channels]
        prompt_attention_mask: jnp.ndarray,  # [B, L]
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_attention_mask: Optional[jnp.ndarray] = None,
        latents: Optional[jnp.ndarray] = None,
        media_items: Optional[jnp.ndarray] = None,
        conditioning_items: Optional[List[ConditioningItem]] = None,
        ref_image: Optional[jnp.ndarray] = None,  # [B, 1, H, W, 3]
        pose_frames: Optional[jnp.ndarray] = None,  # [B, F, H, W, 3]
        ref_latents: Optional[jnp.ndarray] = None,  # pre-encoded [B,1,h,w,C]
        pose_latents: Optional[jnp.ndarray] = None,  # pre-encoded [B,f,h,w,C]
        lora: Optional[dict] = None,
        output_type: str = "np",  # "latent" | "np"
        dtype=jnp.bfloat16,
        sample_keys: Optional[jnp.ndarray] = None,  # [B] per-sample keys
    ):
        p = params
        batch_size = prompt_embeds.shape[0]
        if self.dp_mesh is not None:
            ndev = self.dp_mesh.shape[self.dp_axis]
            assert batch_size % ndev == 0, (
                f"dp_mesh: batch {batch_size} must be a multiple of the "
                f"'{self.dp_axis}' axis size {ndev} (the serving layer pads)"
            )
            # shard every per-sample input up front so the VAE encodes, the
            # denoising loop, and the decode all run data-parallel
            (
                prompt_embeds, prompt_attention_mask,
                negative_prompt_embeds, negative_prompt_attention_mask,
                latents, media_items, ref_image, pose_frames,
                ref_latents, pose_latents, sample_keys,
            ) = self._dp_put(
                prompt_embeds, prompt_attention_mask,
                negative_prompt_embeds, negative_prompt_attention_mask,
                latents, media_items, ref_image, pose_frames,
                ref_latents, pose_latents, sample_keys,
            )
        video_scale = self.video_scale_factor if p.is_video else 1

        latent_height = p.height // self.vae_scale_factor
        latent_width = p.width // self.vae_scale_factor
        latent_num_frames = p.num_frames // video_scale
        if p.is_video:
            latent_num_frames += 1  # causal VAE first-frame slot
        latent_shape = (
            batch_size, latent_num_frames, latent_height, latent_width,
            self.dit_cfg.in_channels,
        )

        # -- schedule (host-side numpy) --
        sched = self.schedule.set_timesteps(
            num_inference_steps=p.num_inference_steps,
            samples_shape=(batch_size, self.dit_cfg.in_channels,
                           latent_num_frames, latent_height, latent_width),
        )
        timesteps = sched.sigmas
        if p.skip_initial_inference_steps or p.skip_final_inference_steps:
            assert (
                p.skip_initial_inference_steps == 0
                or latents is not None or media_items is not None
            ), "skip_initial_inference_steps requires media_items or latents"
            timesteps = timesteps[
                p.skip_initial_inference_steps:
                len(timesteps) - p.skip_final_inference_steps
            ]
        if self.allowed_inference_steps is not None:
            for t in np.round(timesteps, 4):
                assert t in self.allowed_inference_steps, (
                    f"Invalid inference timestep {t}"
                )

        guidance = _as_step_array(p.guidance_scale, timesteps, p.guidance_timesteps)
        stg = _as_step_array(p.stg_scale, timesteps, p.guidance_timesteps)
        rescale = _as_step_array(p.rescaling_scale, timesteps, p.guidance_timesteps)

        do_cfg = bool((guidance > 1.0).any())
        do_stg = bool((stg > 0).any())
        num_conds = 1 + int(do_cfg) + int(do_stg)

        # -- prompt embeds batch (pipeline_ltx_video.py:1014-1037) --
        neg = (
            jnp.zeros_like(prompt_embeds)
            if negative_prompt_embeds is None else negative_prompt_embeds
        )
        neg_mask = (
            jnp.zeros_like(prompt_attention_mask)
            if negative_prompt_attention_mask is None
            else negative_prompt_attention_mask
        )
        embed_parts, mask_parts = [], []
        if do_cfg:
            embed_parts.append(neg)
            mask_parts.append(neg_mask)
        embed_parts.append(prompt_embeds)
        mask_parts.append(prompt_attention_mask)
        if do_stg:
            embed_parts.append(prompt_embeds)
            mask_parts.append(prompt_attention_mask)
        prompt_embeds_b = jnp.concatenate(embed_parts).astype(dtype)
        prompt_mask_b = jnp.concatenate(mask_parts)

        # -- avatar conditioning latents --
        k_ref, k_pose, k_lat, k_cond, k_loop, k_dec = jax.random.split(key, 6)
        ref_lat = None if ref_latents is None else ref_latents.astype(dtype)
        pose_lat = None if pose_latents is None else pose_latents.astype(dtype)
        if ref_image is not None:
            ref_lat = self.encode_media(
                ref_image.astype(dtype), k_ref, p.vae_per_channel_normalize
            )
        if pose_frames is not None:
            pose_lat = self.encode_media(
                pose_frames.astype(dtype), k_pose, p.vae_per_channel_normalize
            )
        has_avatar = ref_lat is not None and pose_lat is not None

        # -- initial latents + conditioning --
        init = self.prepare_latents(
            k_lat, latent_shape, dtype, latents=latents,
            media_items=media_items,
            timestep=float(timesteps[0]),
            vae_per_channel_normalize=p.vae_per_channel_normalize,
            sample_keys=sample_keys,
        )
        tokens, pixel_coords, cond_mask, num_cond_latents = (
            self.prepare_conditioning(
                conditioning_items, init, k_cond, p.vae_per_channel_normalize
            )
        )

        # fractional coords: time axis scaled by 1/frame_rate
        fractional = pixel_coords.astype(jnp.float32)
        fractional = fractional.at[:, 0].multiply(1.0 / p.frame_rate)
        fractional_b = (
            jnp.concatenate([fractional] * num_conds)
            if num_conds > 1 else fractional
        )

        skip_layer_mask = None
        skip_mask_per_step = False
        if do_stg and p.skip_block_list:
            sbl = p.skip_block_list
            if sbl and isinstance(sbl[0], (list, tuple)):
                # per-timestep block lists mapped through the guidance
                # mapping (pipeline_ltx_video.py:975-984): STG skips
                # *different* blocks at different steps
                assert p.guidance_timesteps, (
                    "per-timestep skip_block_list requires guidance_timesteps"
                )
                mapping = _guidance_mapping(timesteps, p.guidance_timesteps)
                masks = [
                    create_skip_layer_mask(
                        self.dit_cfg.num_layers, batch_size, num_conds,
                        num_conds - 1, sbl[m],
                    )
                    for m in mapping
                ]
                ident = jnp.ones(
                    (self.dit_cfg.num_layers, batch_size * num_conds),
                    dtype=jnp.float32,
                )
                skip_layer_mask = jnp.stack(
                    [m if m is not None else ident for m in masks]
                )  # [num_steps, num_layers, B*num_conds]
                skip_mask_per_step = True
            else:
                skip_layer_mask = create_skip_layer_mask(
                    self.dit_cfg.num_layers, batch_size, num_conds,
                    num_conds - 1, sbl,
                )

        if p.solver not in ("euler", "heun"):
            raise ValueError(f"unknown solver {p.solver!r}")
        if p.solver == "heun" and p.stochastic_sampling:
            raise ValueError(
                "solver='heun' is a deterministic ODE integrator; it does "
                "not compose with stochastic_sampling"
            )
        statics = (
            num_conds, do_cfg, do_stg, p.cfg_star_rescale,
            p.stochastic_sampling, cond_mask is not None, has_avatar,
            skip_layer_mask is not None, skip_mask_per_step,
            float(p.image_cond_noise_scale),
            p.skip_layer_strategy, self.attention_impl, p.solver,
        )
        denoiser = self._get_denoiser(statics)
        if self.dp_mesh is not None:
            # pin the derived per-sample arrays (initial noise is generated
            # unsharded; concatenated cond batches follow B*num_conds) so
            # the one-compile loop runs fully data-parallel
            tokens, fractional_b, prompt_embeds_b, prompt_mask_b = (
                self._dp_put(tokens, fractional_b, prompt_embeds_b,
                             prompt_mask_b)
            )
            cond_mask, ref_lat, pose_lat = self._dp_put(
                cond_mask, ref_lat, pose_lat
            )
        sigmas = jnp.asarray(timesteps, dtype=jnp.float32)
        final_tokens = denoiser(
            self.dit_params, lora, tokens, tokens, fractional_b,
            prompt_embeds_b, prompt_mask_b, sigmas,
            jnp.asarray(guidance), jnp.asarray(stg), jnp.asarray(rescale),
            cond_mask, ref_lat, pose_lat, skip_layer_mask, k_loop,
        )

        # strip extra conditioning tokens, un-patchify
        if num_cond_latents:
            final_tokens = final_tokens[:, num_cond_latents:]
        latents_out = unpatchify(
            final_tokens, latent_num_frames, latent_height, latent_width,
            self.patch_size,
        )

        if output_type == "latent":
            return latents_out

        return self.decode_latents(latents_out, p, key=k_dec,
                                   output_type=output_type)

    def decode_latents(
        self,
        latents: jnp.ndarray,  # [B, F, H, W, C] denoised latents
        p: "GenerationParams",
        key: Optional[jax.Array] = None,
        output_type: str = "np",
    ) -> jnp.ndarray:
        """Decode denoised latents to media exactly as ``__call__`` does:
        decode-time noise injection + timestep conditioning
        (pipeline_ltx_video.py:1306-1321), tone mapping, VAE decode, and
        fused postprocess (vae_decode wrapper parity, vae_encode.py:94)."""
        batch_size = latents.shape[0]
        if key is None:
            key = jax.random.PRNGKey(0)
        ctx = self._mesh_ctx()
        decode_timestep = p.decode_timestep
        if not isinstance(decode_timestep, (list, tuple)):
            decode_timestep = [decode_timestep] * batch_size
        decode_noise_scale = p.decode_noise_scale
        if decode_noise_scale is None:
            decode_noise_scale = decode_timestep
        elif not isinstance(decode_noise_scale, (list, tuple)):
            decode_noise_scale = [decode_noise_scale] * batch_size

        with ctx:
            return self._decode_fn(
                self.vae_params, latents,
                jnp.asarray(decode_timestep, dtype=jnp.float32),
                jnp.asarray(decode_noise_scale, dtype=jnp.float32),
                key,
                tone_map=float(p.tone_map_compression_ratio),
                pcn=p.vae_per_channel_normalize,
                timestep_conditioning=self.vae_cfg.timestep_conditioning,
                output_type=output_type,
            )
