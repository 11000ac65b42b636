"""CRF conditioning-compression tests (reference crf_compressor.py:34-50).

Covers the native libavcodec/libx264 backend (exact H.264 CRF round-trip,
no PyAV needed) and the calibrated JPEG proxy fallback
(tools/calibrate_crf_proxy.py pins quality 90 for CRF 29).
"""

import numpy as np
import pytest

from avatar_tpu.data import media
from avatar_tpu.native import crf_roundtrip


def _frame(size=128, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.stack(
        [np.sin(x / 7) * 0.5 + 0.5, y / size, np.sin((x + y) / 9) * 0.5 + 0.5],
        -1,
    )
    img = np.clip(img + rng.normal(0, 0.03, img.shape), 0, 1)
    return (img * 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


NATIVE = crf_roundtrip(_frame(), 29) is not None


@pytest.mark.skipif(not NATIVE, reason="no system libavcodec/libx264")
class TestNativeCRF:
    def test_roundtrip_shape_dtype_deterministic(self):
        img = _frame()
        out = crf_roundtrip(img, 29)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.array_equal(out, crf_roundtrip(img, 29))

    def test_quality_monotone_in_crf(self):
        img = _frame()
        psnrs = [_psnr(img, crf_roundtrip(img, c)) for c in (10, 29, 45)]
        assert psnrs[0] > psnrs[1] > psnrs[2], psnrs

    def test_crf29_is_lossy_but_reasonable(self):
        img = _frame()
        p = _psnr(img, crf_roundtrip(img, 29))
        assert 20 < p < 45, p

    def test_odd_dims_rejected(self):
        assert crf_roundtrip(_frame(127)[:127, :127], 29) is None


def test_crf_compress_identity_at_zero():
    img = _frame().astype(np.float32) / 255.0
    out = media.crf_compress(img, crf=0)
    np.testing.assert_array_equal(out, img)


def test_crf_compress_crops_odd_dims_and_ranges():
    img = _frame(130).astype(np.float32)[:129, :127] / 255.0
    out = media.crf_compress(img, crf=29)
    assert out.shape == (128, 126, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_crf_compress_changes_pixels():
    img = _frame().astype(np.float32) / 255.0
    out = media.crf_compress(img, crf=29)
    assert np.mean(np.abs(out - img)) > 1e-3  # actually compressed


@pytest.mark.skipif(not NATIVE, reason="no system libavcodec/libx264")
def test_jpeg_proxy_statistics_match_true_crf():
    """The calibrated JPEG proxy must stay within a documented band of the
    TRUE CRF-29 artifact statistics on the CALIBRATION frames (the deltas
    are resolution/content dependent; the pin was made on these 256px
    frames) — guards the pinned quality (90) against drift."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from calibrate_crf_proxy import (
        blockiness, jpeg_roundtrip, psnr, test_frames,
    )

    frames = test_frames(3)
    quality = 90  # the calibrated pin in media.crf_compress
    d_psnr, d_blk = [], []
    for f in frames:
        true = crf_roundtrip(f, 29)
        prox = jpeg_roundtrip(f, quality)
        d_psnr.append(psnr(f, prox) - psnr(f, true))
        d_blk.append(blockiness(prox) - blockiness(true))
    # measured at calibration time: +0.87 dB / -0.066 blockiness
    assert abs(float(np.mean(d_psnr))) < 1.5, d_psnr
    assert abs(float(np.mean(d_blk))) < 0.5, d_blk
