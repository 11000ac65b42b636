"""Calibrate the JPEG-quality CRF proxy against TRUE H.264 CRF artifacts.

The reference conditions its avatar inputs on an H.264-CRF-29 round-trip
(`/root/reference/ltx_video/pipelines/crf_compressor.py:34-50`).  On
machines without PyAV AND without system libavcodec, avatar_tpu falls
back to a JPEG round-trip; this tool pins that proxy's quality setting
by matching artifact statistics against the exact native CRF path
(avatar_tpu.native.crf_roundtrip — system libx264) over a sweep of
structured test frames:

  * PSNR vs the uncompressed source (overall distortion level)
  * blockiness: mean absolute luma discontinuity across 8px block
    boundaries minus the same statistic off-boundary (DCT block edges)

Run: python tools/calibrate_crf_proxy.py
The chosen quality is asserted in tests/test_preprocess.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avatar_tpu.native import crf_roundtrip  # noqa: E402


def test_frames(n=6, size=256):
    """Structured frames spanning smooth/texture/edge content (no natural
    photos in this image; these cover the artifact-relevant regimes)."""
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    frames = []
    for i in range(n):
        base = np.stack(
            [
                np.sin(x / (4 + 3 * i)) * 0.5 + 0.5,
                y / size,
                np.sin((x + y) / (6 + 2 * i)) * 0.5 + 0.5,
            ],
            -1,
        )
        blobs = np.zeros((size, size, 1), np.float32)
        for _ in range(12):
            cx, cy = rng.uniform(0, size, 2)
            r = rng.uniform(8, 40)
            blobs[..., 0] += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / r**2)
        noise = rng.normal(0, 0.04, (size, size, 3)).astype(np.float32)
        f = np.clip(0.6 * base + 0.3 * blobs + noise, 0, 1)
        frames.append((f * 255).astype(np.uint8))
    return frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


def blockiness(img):
    """Mean |luma step| across 8px block boundaries minus off-boundary."""
    luma = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114])
    d = np.abs(np.diff(luma, axis=1))
    on = d[:, 7::8].mean()
    off = np.delete(d, np.s_[7::8], axis=1).mean()
    dv = np.abs(np.diff(luma, axis=0))
    on += dv[7::8, :].mean()
    off += np.delete(dv, np.s_[7::8], axis=0).mean()
    return (on - off) / 2


def jpeg_roundtrip(img, quality):
    import cv2

    ok, enc = cv2.imencode(
        ".jpg", img[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    )
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]


def main(crf=29):
    frames = test_frames()
    h264 = [crf_roundtrip(f, crf) for f in frames]
    assert all(o is not None for o in h264), "native CRF backend unavailable"
    t_psnr = np.mean([psnr(f, o) for f, o in zip(frames, h264)])
    t_blk = np.mean([blockiness(o) for o in h264])
    print(f"H.264 CRF {crf}: psnr={t_psnr:.2f} dB  blockiness={t_blk:.3f}")

    best, rows = None, []
    for q in range(10, 96, 5):
        jp = [jpeg_roundtrip(f, q) for f in frames]
        p = np.mean([psnr(f, o) for f, o in zip(frames, jp)])
        b = np.mean([blockiness(o) for o in jp])
        # |delta PSNR| in dB + |delta blockiness| in luma steps, weighted
        # so one dB trades against half a luma step of block edge —
        # comparable perceptual magnitudes for compression artifacts
        score = abs(p - t_psnr) + 2.0 * abs(b - t_blk)
        rows.append((q, p, b, score))
        if best is None or score < best[3]:
            best = rows[-1]
    for q, p, b, s in rows:
        mark = " <-- best" if best is not None and q == best[0] else ""
        print(f"  jpeg q={q:2d}: psnr={p:5.2f}  blockiness={b:6.3f}  "
              f"score={s:.4f}{mark}")
    assert best is not None
    print(f"\ncalibrated proxy: JPEG quality {best[0]} for CRF {crf} "
          f"(delta psnr {best[1] - t_psnr:+.2f} dB, "
          f"blockiness {best[2] - t_blk:+.3f})")
    current = max(5, 95 - 2 * crf)
    print(f"current formula max(5, 95-2*crf) gives {current}")


if __name__ == "__main__":
    main()
