"""Device-side colorspace conversion.

RGB -> I420 (YUV 4:2:0 planar) on-device halves the device->host transfer
(1.5 bytes/pixel vs 3) and hands video muxers the layout they consume
directly (x264/ffmpeg/cv2 all take I420).  Coefficients match OpenCV's
``COLOR_RGB2YUV_I420`` (full-range BT.601, chroma offset 128) so
``cv2.cvtColor(out, COLOR_YUV2BGR_I420)`` round-trips on the host; parity
is tested against cv2 in tests/test_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_yuv420(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., F, H, W, 3] float (0..1) or uint8 RGB -> [..., F, H*3//2, W]
    uint8 I420 planes (Y full-res; U, V quarter-res appended below,
    each reshaped to W-wide rows exactly like OpenCV's I420 layout)."""
    if rgb.dtype == jnp.uint8:
        rgbf = rgb.astype(jnp.float32)
    else:
        rgbf = rgb.astype(jnp.float32) * 255.0
    *lead, h, w, _ = rgbf.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    # studio-swing BT.601 (what cv2's I420 conversions use)
    y = 0.256788 * r + 0.504129 * g + 0.097906 * b + 16.0
    u = -0.148223 * r - 0.290993 * g + 0.439216 * b + 128.0
    v = 0.439216 * r - 0.367788 * g - 0.071427 * b + 128.0

    def sub(c):  # top-left chroma sample per 2x2 block (cv2 semantics)
        return c[..., 0::2, 0::2]

    u_s, v_s = sub(u), sub(v)
    # I420 plane layout: Y [h, w], then U and V each packed into
    # (h//4, w) rows (h//2 * w//2 values reflowed at width w)
    u_rows = u_s.reshape(*lead, h // 4, w)
    v_rows = v_s.reshape(*lead, h // 4, w)
    planes = jnp.concatenate([y, u_rows, v_rows], axis=-2)
    return jnp.clip(planes + 0.5, 0.0, 255.0).astype(jnp.uint8)
