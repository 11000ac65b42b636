"""Native (C) components, built on demand against system libraries.

`crf_roundtrip` is the exact H.264-CRF conditioning compressor
(reference `ltx_video/pipelines/crf_compressor.py`) implemented against
the system libavcodec/libx264 via a small C shim — no PyAV needed.
Everything degrades gracefully: when the toolchain or the codec
libraries are absent, the loaders return None and callers fall back.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB = {"crf": "unloaded"}


def _build_crf_lib() -> Path | None:
    """Compile crf_codec.c into a cached shared object; None on failure."""
    src = _HERE / "crf_codec.c"
    cache = Path(
        os.environ.get("AVATAR_TPU_NATIVE_CACHE", _HERE / "_build")
    )
    so = cache / "libavatar_crf.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        flags = subprocess.run(
            ["pkg-config", "--cflags", "--libs",
             "libavcodec", "libavutil", "libswscale"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        cache.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(".so.tmp")
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", str(src), "-o", str(tmp)]
            + flags,
            capture_output=True, text=True, check=True,
        )
        os.replace(tmp, so)
        return so
    except (OSError, subprocess.CalledProcessError):
        return None


def _crf_lib():
    with _LOCK:
        if _LIB["crf"] == "unloaded":
            so = _build_crf_lib()
            lib = None
            if so is not None:
                try:
                    lib = ctypes.CDLL(str(so))
                    lib.avatar_crf_roundtrip_rgb.restype = ctypes.c_int
                    lib.avatar_crf_roundtrip_rgb.argtypes = [
                        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                        ctypes.c_int, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_uint8),
                    ]
                except OSError:
                    lib = None
            _LIB["crf"] = lib
        return _LIB["crf"]


def crf_roundtrip(rgb: np.ndarray, crf: int) -> np.ndarray | None:
    """H.264 round-trip of a [H, W, 3] uint8 rgb image at the given CRF
    via the native shim.  Returns the decoded uint8 array, or None when
    the native backend is unavailable (caller falls back)."""
    lib = _crf_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = arr.shape[:2]
    out = np.empty_like(arr)
    rc = lib.avatar_crf_roundtrip_rgb(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, int(crf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None
