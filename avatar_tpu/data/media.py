"""Host-side media IO: image/video loading with the reference's exact
preprocessing chain, CRF compression round-trip, padding math, and video
writing. Zero device code — everything here is numpy/PIL/cv2.

Mirrors `/root/reference/ltx_video/inference.py:57-171,559-616` and
`pipelines/crf_compressor.py`; tensors are channels-last [B, F, H, W, 3]
in [-1, 1].
"""

from __future__ import annotations

import io
import os
from pathlib import Path
from typing import Tuple, Union

import numpy as np
from PIL import Image


def crf_compress(image: np.ndarray, crf: int = 29) -> np.ndarray:
    """H.264 CRF encode/decode round-trip of a [H, W, 3] float [0,1] image
    (crf_compressor.py:34-50) — intentionally matches training-data
    compression artifacts. Backends in preference order: PyAV, the native
    libavcodec/libx264 shim (avatar_tpu.native — pixel-identical to the
    reference given the same libx264; mp4 muxing is lossless), JPEG
    quality fallback (approximate artifacts; warned once, quality
    calibrated against true CRF in tools/calibrate_crf_proxy.py)."""
    if crf == 0:
        return image
    arr = (image[: image.shape[0] // 2 * 2, : image.shape[1] // 2 * 2] * 255.0)
    arr = arr.astype(np.uint8)

    try:
        import av  # PyAV (the reference backend)

        with io.BytesIO() as buf:
            container = av.open(buf, "w", format="mp4")
            try:
                stream = container.add_stream(
                    "libx264", rate=1,
                    options={"crf": str(crf), "preset": "veryfast"},
                )
                stream.height, stream.width = arr.shape[0], arr.shape[1]
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24").reformat(
                    format="yuv420p"
                )
                container.mux(stream.encode(frame))
                container.mux(stream.encode())
            finally:
                container.close()
            data = buf.getvalue()
        with io.BytesIO(data) as buf:
            container = av.open(buf)
            try:
                stream = next(s for s in container.streams if s.type == "video")
                decoded = next(container.decode(stream)).to_ndarray(format="rgb24")
            finally:
                container.close()
        return decoded.astype(image.dtype) / 255.0
    except ImportError:
        pass

    # Native shim: the same libx264 CRF round-trip via system libavcodec.
    from avatar_tpu.native import crf_roundtrip

    decoded = crf_roundtrip(arr, crf)
    if decoded is not None:
        return decoded.astype(image.dtype) / 255.0

    # JPEG round-trip fallback (cv2), calibrated against TRUE libx264
    # output (tools/calibrate_crf_proxy.py): H.264's in-loop deblocking
    # keeps block edges smooth, so the statistical match for CRF 29 is a
    # HIGH JPEG quality (90: delta PSNR +0.55 dB, delta blockiness -0.03
    # luma steps on structured test frames), not the mid quality a naive
    # bitrate analogy suggests.  Off the calibrated point, scale in QP
    # space: one CRF step ~ one H.264 QP step ~ -2 JPEG quality.
    global _WARNED_CRF_FALLBACK
    if not globals().get("_WARNED_CRF_FALLBACK"):
        import warnings

        warnings.warn(
            "PyAV/libavcodec not available: using calibrated JPEG "
            "round-trip as CRF-compression proxy (install `av` for exact "
            "reference behavior)."
        )
        globals()["_WARNED_CRF_FALLBACK"] = True
    import cv2

    quality = int(np.clip(90 - 2 * (crf - 29), 5, 95))
    ok, enc = cv2.imencode(
        ".jpg", arr[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), quality]
    )
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    return dec.astype(image.dtype) / 255.0


def _gaussian_blur3(img: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """torchvision gaussian_blur(kernel_size=3, sigma=1.0) equivalent."""
    import cv2

    return cv2.GaussianBlur(img, (3, 3), sigmaX=sigma, sigmaY=sigma)


def load_image_to_array_with_resize_and_crop(
    image_input: Union[str, Image.Image],
    target_height: int = 512,
    target_width: int = 768,
    just_crop: bool = False,
    apply_blur_and_compress: bool = True,
) -> np.ndarray:
    """inference.py:57-103: aspect-preserving center-crop + resize, 3x3
    gaussian blur, CRF-29 compression round-trip, [-1,1] normalization.
    Returns [1, 1, H, W, 3]."""
    if isinstance(image_input, (str, Path)):
        image = Image.open(image_input).convert("RGB")
    elif isinstance(image_input, Image.Image):
        image = image_input
    else:
        raise ValueError("image_input must be a path or PIL Image")

    input_width, input_height = image.size
    aspect_target = target_width / target_height
    aspect_frame = input_width / input_height
    if aspect_frame > aspect_target:
        new_width = int(input_height * aspect_target)
        new_height = input_height
        x_start = (input_width - new_width) // 2
        y_start = 0
    else:
        new_width = input_width
        new_height = int(input_width / aspect_target)
        x_start = 0
        y_start = (input_height - new_height) // 2
    image = image.crop((x_start, y_start, x_start + new_width, y_start + new_height))
    if not just_crop:
        image = image.resize((target_width, target_height))

    arr = np.asarray(image, dtype=np.float32) / 255.0  # [H, W, 3]
    if apply_blur_and_compress:
        arr = _gaussian_blur3(arr, sigma=1.0)
        arr = crf_compress(arr)
    arr = arr * 255.0 / 127.5 - 1.0
    return arr[None, None]  # [1, 1, H, W, 3]


def calculate_padding(
    source_height: int, source_width: int, target_height: int, target_width: int
) -> Tuple[int, int, int, int]:
    """(left, right, top, bottom) symmetric padding (inference.py:105-124)."""
    pad_height = target_height - source_height
    pad_width = target_width - source_width
    pad_top = pad_height // 2
    pad_bottom = pad_height - pad_top
    pad_left = pad_width // 2
    pad_right = pad_width - pad_left
    return (pad_left, pad_right, pad_top, pad_bottom)


def pad_media(media: np.ndarray, padding: Tuple[int, int, int, int]) -> np.ndarray:
    """Zero-pad [B, F, H, W, C] by (left, right, top, bottom)."""
    l, r, t, b = padding
    return np.pad(media, ((0, 0), (0, 0), (t, b), (l, r), (0, 0)))


def unpad_media(media: np.ndarray, padding: Tuple[int, int, int, int]) -> np.ndarray:
    l, r, t, b = padding
    h, w = media.shape[2], media.shape[3]
    return media[:, :, t : h - b if b else h, l : w - r if r else w]


def load_media_file(
    media_path: str,
    height: int,
    width: int,
    padding: Tuple[int, int, int, int],
    just_crop: bool = False,
) -> np.ndarray:
    """inference.py:559-616: image file, video file, or folder of frames ->
    [1, F, H, W, 3] in [-1, 1], padded."""
    media_path = Path(media_path)
    if media_path.is_dir():
        image_files = sorted(
            f for f in os.listdir(media_path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        )
        if not image_files:
            raise ValueError(f"No image files found in folder: {media_path}")
        frames = [
            load_image_to_array_with_resize_and_crop(
                media_path / f, height, width, just_crop=just_crop
            )
            for f in image_files
        ]
        media = np.concatenate(frames, axis=1)
    elif media_path.suffix.lower() in (".mp4", ".avi", ".mov", ".mkv", ".webm"):
        frames = [
            load_image_to_array_with_resize_and_crop(
                Image.fromarray(frame), height, width, just_crop=just_crop
            )
            for frame in read_video_frames(media_path)
        ]
        media = np.concatenate(frames, axis=1)
    else:
        media = load_image_to_array_with_resize_and_crop(
            media_path, height, width, just_crop=just_crop
        )
    return pad_media(media, padding)


def read_video_frames(path: Union[str, Path]):
    """Yield RGB uint8 frames from a video file (cv2; ffmpeg-free env)."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame[..., ::-1]  # BGR -> RGB
    finally:
        cap.release()


def write_video(
    path: Union[str, Path],
    video: np.ndarray,  # [F, H, W, 3] float in [0, 1]
    fps: float = 25.0,
) -> None:
    """inference.py:516-520 equivalent. Backends: cv2 VideoWriter (this
    image has no ffmpeg/PyAV); if no codec is available, falls back to a
    PNG frame directory next to the requested path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if video.dtype == np.uint8:
        video_u8 = video
    else:
        video_u8 = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    if video_u8.shape[0] == 1 or str(path).endswith(".png"):
        Image.fromarray(video_u8[0]).save(str(path))
        return

    import cv2

    h, w = video_u8.shape[1:3]
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if writer.isOpened():
        try:
            for frame in video_u8:
                writer.write(frame[..., ::-1])  # RGB -> BGR
        finally:
            writer.release()
        if path.stat().st_size > 0:
            return
    # codec unavailable: PNG frame directory fallback
    frames_dir = path.with_suffix("")
    frames_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(video_u8):
        Image.fromarray(frame).save(frames_dir / f"frame_{i:05d}.png")
