"""Inference CLI: image + text -> talking-avatar video.

Re-design of `/root/reference/ltx_video/inference.py:276-634`:
face-bbox detection on the conditioning image -> FaceFormer pose-frame
generation -> VAE-encoded ref/pose conditioning -> jit-compiled rectified-
flow generation -> crop padding, write mp4/png.

Usage:
  python -m avatar_tpu.cli.infer --prompt "..." --text "..." \
      --conditioning_media_paths ref.png pose_frames_dir \
      --pipeline_config configs/inference-avatars.yaml
"""

from __future__ import annotations

import argparse
import random
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import numpy as np
import yaml


@dataclass
class InferenceConfig:
    """inference.py:276-341 surface."""

    prompt: str = ""
    text: str = ""  # text to pronounce (drives TTS + FaceFormer)
    output_path: Optional[str] = None
    pipeline_config: str = "configs/inference-avatars.yaml"
    seed: int = 171198
    height: int = 192
    width: int = 320
    num_frames: int = 121
    frame_rate: int = 20
    negative_prompt: str = (
        "worst quality, inconsistent motion, blurry, jittery, distorted"
    )
    input_media_path: Optional[str] = None
    image_cond_noise_scale: float = 0.0
    conditioning_media_paths: Optional[List[str]] = None
    conditioning_strengths: Optional[List[float]] = None
    # paths for the FaceFormer assets (reference hardcodes relative paths)
    faceformer_checkpoint: str = "preprocessing/FaceFormer/vocaset.pth"
    flame_template: str = "preprocessing/FLAME_template.npy"
    # precomputed prompt embeddings (for environments without the T5 weights)
    prompt_embeds_path: Optional[str] = None
    # long-video windowed generation (pipelines/long_video.py): when
    # window_frames > 0 and num_frames exceeds it, generate overlapping
    # windows with pixel-space handoff instead of one giant denoise.
    # 0 = take the value from the pipeline yaml (overlap default: 9)
    window_frames: int = 0
    overlap_frames: int = 0


def load_pipeline_config(pipeline_config: str) -> dict:
    path = Path(pipeline_config)
    if not path.is_file():
        alt = Path(__file__).parent.parent.parent / pipeline_config
        if alt.is_file():
            path = alt
        else:
            raise ValueError(f"Pipeline config file {pipeline_config} does not exist")
    with open(path) as f:
        return yaml.safe_load(f)


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def create_ltx_video_pipeline(
    ckpt_path: str,
    precision: str = "bfloat16",
    sampler: Optional[str] = None,
    attention_impl: str = "auto",
    vae_ckpt_path: Optional[str] = None,
    quantize: Optional[str] = None,
    quantize_vae: Optional[str] = None,
    scan_blocks: bool = False,
):
    """inference.py:194-251: VAE + transformer + RF schedule from one
    single-file safetensors. Fine-tuned exports are transformer-only; the
    VAE then comes from ``vae_checkpoint_path`` (the base checkpoint)."""
    import jax
    import jax.numpy as jnp

    from avatar_tpu.diffusion import RectifiedFlowSchedule
    from avatar_tpu.models.dit import DiTConfig
    from avatar_tpu.models.vae import VAEConfig
    from avatar_tpu.utils.weight_import import (
        import_transformer_state,
        import_vae_state,
        load_single_file_checkpoint,
    )
    from avatar_tpu.pipelines import LTXVideoPipeline

    configs, t_state, v_state = load_single_file_checkpoint(ckpt_path)
    dit_cfg = DiTConfig.from_dict(configs["transformer"])
    dit_params = import_transformer_state(t_state, dit_cfg)
    sched_cfg = configs.get("scheduler")

    if not v_state and vae_ckpt_path:
        v_configs, _, v_state = load_single_file_checkpoint(vae_ckpt_path)
        vae_config_dict = v_configs.get("vae", configs.get("vae"))
    else:
        vae_config_dict = configs.get("vae")
    if not v_state:
        raise ValueError(
            f"{ckpt_path} has no VAE weights; set vae_checkpoint_path in the "
            "pipeline config to the base checkpoint."
        )
    vae_cfg = VAEConfig.from_dict(vae_config_dict)
    vae_params = import_vae_state(v_state, vae_cfg)
    if precision in ("bfloat16", "bf16"):
        cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)  # noqa: E731
        dit_params, vae_params = cast(dit_params), cast(vae_params)

    if sampler == "from_checkpoint" or sampler is None:
        schedule = RectifiedFlowSchedule.from_config(sched_cfg or {})
    else:
        schedule = RectifiedFlowSchedule.create(
            sampler={"uniform": "Uniform", "linear-quadratic": "LinearQuadratic"}[
                sampler.lower()
            ]
        )
    return LTXVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params,
        schedule=schedule, attention_impl=attention_impl,
        quantize_weights=quantize or False,
        quantize_vae=quantize_vae or False,
        scan_blocks=scan_blocks,
    )


def _encode_prompts(config: InferenceConfig, pipeline_config: dict):
    """T5-encode prompt + negative prompt; falls back to a precomputed
    embeddings file (keys: prompt_embeds, prompt_attention_mask,
    negative_prompt_embeds, negative_prompt_attention_mask)."""
    import jax.numpy as jnp

    if config.prompt_embeds_path:
        from avatar_tpu.utils.safetensors_io import load_safetensors

        t, _ = load_safetensors(config.prompt_embeds_path)
        return (
            jnp.asarray(t["prompt_embeds"]),
            jnp.asarray(t["prompt_attention_mask"]),
            jnp.asarray(t.get("negative_prompt_embeds")) if "negative_prompt_embeds" in t else None,
            jnp.asarray(t.get("negative_prompt_attention_mask")) if "negative_prompt_attention_mask" in t else None,
        )

    from transformers import T5TokenizerFast

    from avatar_tpu.models.t5 import encode_prompt, load_t5_encoder

    model_path = pipeline_config.get(
        "text_encoder_model_name_or_path",
        "PixArt-alpha/PixArt-XL-2-1024-MS",
    )
    # "w8" keeps T5-XXL HBM-resident (4.76 GB int8) beside the DiT+VAE
    # instead of encode-then-free; see models/t5.py:load_t5_encoder
    t5_cfg, t5_params = load_t5_encoder(
        model_path, quantize=pipeline_config.get("quantization_text_encoder")
    )
    tokenizer = T5TokenizerFast.from_pretrained(model_path, subfolder="tokenizer")
    embeds, mask = encode_prompt(t5_params, t5_cfg, tokenizer, config.prompt)
    neg_embeds, neg_mask = encode_prompt(
        t5_params, t5_cfg, tokenizer, config.negative_prompt
    )
    return embeds, mask, neg_embeds, neg_mask


def infer(config: InferenceConfig):
    import jax
    import jax.numpy as jnp

    from avatar_tpu.data.media import (
        calculate_padding, load_media_file, unpad_media, write_video,
    )
    from avatar_tpu.models.dit import SkipLayerStrategy
    from avatar_tpu.pipelines import GenerationParams

    pipeline_config = load_pipeline_config(config.pipeline_config)
    seed_everything(config.seed)

    output_dir = Path(
        config.output_path or f"outputs/{datetime.today().strftime('%Y-%m-%d')}"
    )
    output_dir.mkdir(parents=True, exist_ok=True)

    # number of frames follows the pose-frame dir (inference.py:365)
    cond_paths = config.conditioning_media_paths or []
    if len(cond_paths) >= 2 and Path(cond_paths[1]).is_dir():
        config.num_frames = len(list(Path(cond_paths[1]).iterdir()))

    height_padded = ((config.height - 1) // 32 + 1) * 32
    width_padded = ((config.width - 1) // 32 + 1) * 32
    num_frames_padded = config.num_frames
    padding = calculate_padding(
        config.height, config.width, height_padded, width_padded
    )

    pipeline = create_ltx_video_pipeline(
        pipeline_config["checkpoint_path"],
        precision=pipeline_config.get("precision", "bfloat16"),
        sampler=pipeline_config.get("sampler"),
        vae_ckpt_path=pipeline_config.get("vae_checkpoint_path"),
        # "w8" (int8 weights, memory) or "w8a8" (int8 MXU matmuls, ~1.4x
        # step speedup; see utils/quantize.py)
        quantize=pipeline_config.get("quantization"),
        # "w8a8": int8 MXU convs in the VAE encode/decode (~1.6x conv
        # throughput; small pixel-fidelity cost — opt-in)
        quantize_vae=pipeline_config.get("quantization_vae"),
        # stacked blocks + lax.scan: depth-independent cold compile
        # (575 s -> 23 s at 512px) at ~+1.4% step time — for cold-start
        # sensitive serving (models/dit.py dit_apply)
        scan_blocks=bool(pipeline_config.get("scan_blocks", False)),
    )

    # multi-scale wrapper when configured
    if pipeline_config.get("pipeline_type") == "multi-scale":
        from avatar_tpu.models.latent_upsampler import load_latent_upsampler
        from avatar_tpu.pipelines.multiscale import LTXMultiScalePipeline

        up_path = pipeline_config["spatial_upscaler_model_path"]
        up_cfg, up_params = load_latent_upsampler(up_path)
        pipeline = LTXMultiScalePipeline(pipeline, up_cfg, up_params)

    conditioning = [
        load_media_file(p, config.height, config.width, padding)
        for p in cond_paths
    ]

    stg_mode = pipeline_config.pop("stg_mode", "attention_values").lower()
    strategy = {
        "stg_av": SkipLayerStrategy.AttentionValues,
        "attention_values": SkipLayerStrategy.AttentionValues,
        "stg_as": SkipLayerStrategy.AttentionSkip,
        "attention_skip": SkipLayerStrategy.AttentionSkip,
        "stg_r": SkipLayerStrategy.Residual,
        "residual": SkipLayerStrategy.Residual,
        "stg_t": SkipLayerStrategy.TransformerBlock,
        "transformer_block": SkipLayerStrategy.TransformerBlock,
    }[stg_mode]

    embeds, mask, neg_embeds, neg_mask = _encode_prompts(config, pipeline_config)

    params = GenerationParams(
        height=height_padded,
        width=width_padded,
        num_frames=num_frames_padded - 1,
        frame_rate=config.frame_rate,
        num_inference_steps=pipeline_config.get("num_inference_steps", 40),
        guidance_scale=pipeline_config.get("guidance_scale", 1.0),
        stg_scale=pipeline_config.get("stg_scale", 0.0),
        rescaling_scale=pipeline_config.get("rescaling_scale", 1.0),
        skip_block_list=pipeline_config.get("skip_block_list"),
        skip_layer_strategy=strategy,
        decode_timestep=pipeline_config.get("decode_timestep", 0.0),
        decode_noise_scale=pipeline_config.get("decode_noise_scale"),
        stochastic_sampling=pipeline_config.get("stochastic_sampling", False),
        image_cond_noise_scale=config.image_cond_noise_scale,
        cfg_star_rescale=pipeline_config.get("cfg_star_rescale", False),
        # "heun": 2nd-order ODE solver — halve num_inference_steps at
        # roughly equal cost/accuracy (pipelines/pipeline.py solver docs)
        solver=pipeline_config.get("solver", "euler"),
    )

    media_items = None
    if config.input_media_path:
        media_items = jnp.asarray(
            load_media_file(
                config.input_media_path, config.height, config.width, padding
            )
        )

    window = config.window_frames or pipeline_config.get("window_frames", 0)
    if window and config.num_frames > window:
        # windowed long-video path: n overlapping fixed-shape windows reuse
        # ONE compiled denoiser; cost is linear in length
        from avatar_tpu.pipelines import LongVideoParams, generate_long_video

        if pipeline_config.get("pipeline_type") == "multi-scale":
            raise ValueError(
                "long-video windowing does not compose with the multi-scale "
                "pipeline; drop window_frames or pipeline_type"
            )
        if media_items is not None:
            raise ValueError(
                "long-video windowing does not take input_media_path"
            )
        long = LongVideoParams(
            num_frames=config.num_frames,
            window_frames=window,
            overlap_frames=(
                config.overlap_frames  # CLI wins when set
                or pipeline_config.get("overlap_frames") or 9
            ),
        )
        images = generate_long_video(
            pipeline, params, long, jax.random.PRNGKey(config.seed),
            embeds, mask,
            negative_prompt_embeds=neg_embeds,
            negative_prompt_attention_mask=neg_mask,
            ref_image=jnp.asarray(conditioning[0]) if conditioning else None,
            pose_frames=(
                jnp.asarray(conditioning[1])
                if len(conditioning) > 1 else None
            ),
            output_type="uint8",
        )
    else:
        images = pipeline(
            params,
            jax.random.PRNGKey(config.seed),
            embeds, mask, neg_embeds, neg_mask,
            media_items=media_items,
            ref_image=jnp.asarray(conditioning[0]) if conditioning else None,
            pose_frames=jnp.asarray(conditioning[1]) if len(conditioning) > 1 else None,
            output_type="uint8",  # device-side quantization (4x smaller fetch)
        )

    # crop padding + trim to requested frames (inference.py:479-492)
    video = unpad_media(np.asarray(images), padding)[:, : config.num_frames]
    h, w = video.shape[2], video.shape[3]
    for i in range(video.shape[0]):
        ext = ".png" if video.shape[1] == 1 else ".mp4"
        name = f"video_output_{i}_{config.seed}_{h}x{w}x{config.num_frames}{ext}"
        write_video(output_dir / name, video[i], fps=config.frame_rate)
        print(f"Output saved to {output_dir / name}")
    return output_dir


def main():
    parser = argparse.ArgumentParser(description="avatar_tpu inference")
    for f_name, f_type, default, helptext in [
        ("prompt", str, "", "Prompt for the generation"),
        ("text", str, "", "Text to pronounce"),
        ("output_path", str, None, "Output folder"),
        ("pipeline_config", str, "configs/inference-avatars.yaml", "Pipeline yaml"),
        ("seed", int, 171198, "Random seed"),
        ("height", int, 192, "Output height"),
        ("width", int, 320, "Output width"),
        ("num_frames", int, 121, "Number of frames"),
        ("frame_rate", int, 20, "Output frame rate"),
        ("negative_prompt", str, InferenceConfig.negative_prompt, ""),
        ("input_media_path", str, None, "vid2vid input"),
        ("image_cond_noise_scale", float, 0.0, ""),
        ("faceformer_checkpoint", str, InferenceConfig.faceformer_checkpoint, ""),
        ("flame_template", str, InferenceConfig.flame_template, ""),
        ("prompt_embeds_path", str, None, "Precomputed T5 embeddings"),
        ("window_frames", int, 0, "Long video: frames per window (%8==1)"),
        ("overlap_frames", int, 0, "Long video: handoff overlap (%8==1)"),
    ]:
        parser.add_argument(f"--{f_name}", type=f_type, default=default, help=helptext)
    parser.add_argument(
        "--conditioning_media_paths", type=str, nargs="*", default=None
    )
    parser.add_argument(
        "--conditioning_strengths", type=float, nargs="*", default=None
    )
    args, _ = parser.parse_known_args()
    config = InferenceConfig(**vars(args))

    # main() flow (inference.py:619-634): detect face, render pose frames,
    # append the pose dir to the conditioning list.
    if config.text and config.conditioning_media_paths:
        from PIL import Image

        from avatar_tpu.pipelines.pose_frames import (
            detect_face_bbox, generate_faceformer_frames,
        )

        image = np.asarray(
            Image.open(config.conditioning_media_paths[0]).convert("RGB")
        )
        bbox = detect_face_bbox(image)
        frames_dir = generate_faceformer_frames(
            config.text,
            output_dir=Path(config.output_path or "outputs") / "pose_frames",
            faceformer_checkpoint=config.faceformer_checkpoint,
            template_path=config.flame_template,
            face_bbox=bbox,
            target_fps=config.frame_rate,
            height=config.height,
            width=config.width,
        )
        config.conditioning_media_paths = [
            config.conditioning_media_paths[0], str(frames_dir)
        ]
    infer(config)


if __name__ == "__main__":
    main()
