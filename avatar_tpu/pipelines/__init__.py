from avatar_tpu.pipelines.pipeline import (
    ConditioningItem,
    GenerationParams,
    LTXVideoPipeline,
    adain_filter_latent,
    tone_map_latents,
)

__all__ = [
    "ConditioningItem",
    "GenerationParams",
    "LTXVideoPipeline",
    "adain_filter_latent",
    "tone_map_latents",
]
