from avatar_tpu.pipelines.serving import AvatarServer, GenerationRequest
from avatar_tpu.pipelines.pipeline import (
    ConditioningItem,
    GenerationParams,
    LTXVideoPipeline,
    adain_filter_latent,
    tone_map_latents,
)

__all__ = [
    "AvatarServer",
    "GenerationRequest",
    "ConditioningItem",
    "GenerationParams",
    "LTXVideoPipeline",
    "adain_filter_latent",
    "tone_map_latents",
]
