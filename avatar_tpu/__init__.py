"""avatar_tpu — TPU-native (JAX/XLA/Pallas) framework for talking-avatar video
generation.

A from-scratch rebuild of the capabilities of
``lusinlu/Video-Generation-for-Human-Avatars`` (LTX-Video 2B rectified-flow DiT
fine-tuning + inference for audio-driven avatars), designed TPU-first:

- functional models over explicit parameter pytrees (no module state),
- jit-compiled rectified-flow Euler sampling (``lax.fori_loop``),
- Pallas flash attention for self/cross attention,
- ``jax.sharding`` data/FSDP/tensor parallelism over a device mesh instead of
  DeepSpeed ZeRO + NCCL.

Layer map (mirrors reference SURVEY.md §1):
  core/       typed configs, mesh + sharding setup, PRNG utilities
  ops/        Pallas kernels + core numeric ops (attention, causal conv3d, RoPE)
  models/     DiT denoiser, causal video VAE, latent upsampler, FaceFormer, T5
  diffusion/  rectified-flow schedules, noising, velocity targets, Euler step
  pipelines/  end-to-end generation (CFG + STG), multi-scale pass
  train/      jitted train step, LoRA, checkpointing (orbax + safetensors)
  data/       latent-pair datasets and preprocessing helpers
  parallel/   mesh/axis-name conventions and sharding helpers
  utils/      safetensors IO, weight import/export, misc
"""

__version__ = "0.1.0"
