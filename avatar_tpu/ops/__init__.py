from avatar_tpu.ops.normalization import (
    rms_norm,
    layer_norm,
    pixel_norm,
)
from avatar_tpu.ops.rope import precompute_freqs_cis, apply_rotary_emb
from avatar_tpu.ops.attention import scaled_dot_product_attention
from avatar_tpu.ops.causal_conv3d import causal_conv3d, conv3d_same
from avatar_tpu.ops.pixel_shuffle import (
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    patchify_pixels,
    unpatchify_pixels,
)

__all__ = [
    "rms_norm",
    "layer_norm",
    "pixel_norm",
    "precompute_freqs_cis",
    "apply_rotary_emb",
    "scaled_dot_product_attention",
    "causal_conv3d",
    "conv3d_same",
    "pixel_shuffle_3d",
    "pixel_unshuffle_3d",
    "patchify_pixels",
    "unpatchify_pixels",
]
