"""Token-space patchifier for the DiT.

Re-design of ``SymmetricPatchifier``
(`/root/reference/ltx_video/models/transformers/symmetric_patchifier.py:54-84`)
for channels-last latents: [B, F, H, W, C] <-> tokens [B, N, C*pt*ph*pw]
plus the per-token (t, y, x) coordinate grid used for RoPE.

The shipped pipelines use patch_size 1 (pipeline builds
``SymmetricPatchifier(patch_size=1)``), where this is a pure reshape.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from einops import rearrange

from avatar_tpu.ops.rope import get_latent_coords


def patchify(
    latents: jnp.ndarray, patch_size: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, F, H, W, C] -> ([B, N, C*p*p], [B, 3, N]) with patch (1, p, p)."""
    b, f, h, w, c = latents.shape
    coords = get_latent_coords(f, h, w, b, patch_size=(1, patch_size, patch_size))
    if patch_size == 1:
        tokens = latents.reshape(b, f * h * w, c)
    else:
        # channel order matches the reference "b c (f p1) (h p2) (w p3) ->
        # b (f h w) (c p1 p2 p3)" after NCFHW->NDHWC transposition
        tokens = rearrange(
            latents,
            "b (f p1) (h p2) (w p3) c -> b (f h w) (c p1 p2 p3)",
            p1=1, p2=patch_size, p3=patch_size,
        )
    return tokens, coords


def unpatchify(
    tokens: jnp.ndarray,
    output_num_frames: int,
    output_height: int,
    output_width: int,
    patch_size: int = 1,
) -> jnp.ndarray:
    """Inverse of :func:`patchify`; output sizes are in latent units."""
    b = tokens.shape[0]
    if patch_size == 1:
        c = tokens.shape[-1]
        return tokens.reshape(b, output_num_frames, output_height, output_width, c)
    return rearrange(
        tokens,
        "b (f h w) (c p1 p2 p3) -> b (f p1) (h p2) (w p3) c",
        f=output_num_frames,
        h=output_height // patch_size,
        w=output_width // patch_size,
        p1=1, p2=patch_size, p3=patch_size,
    )
