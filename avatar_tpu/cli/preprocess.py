"""Offline preprocessing CLIs (one module, five subcommands).

Mirrors `/root/reference/preprocessing/` but with jitted TPU VAE encodes and
double-buffered host decode -> device encode so the chip never waits on IO:

  python -m avatar_tpu.cli.preprocess save-vae-latents --inputs videos/ \
      --output_dir enc --ckpt ckpt.safetensors
  python -m avatar_tpu.cli.preprocess save-condition-latents ...
  python -m avatar_tpu.cli.preprocess save-condition-encoder-latents ...
  python -m avatar_tpu.cli.preprocess save-video-clips ...
  python -m avatar_tpu.cli.preprocess save-text-latents ...

``save-text-latents`` (FaceFormer audio latents, ``{stem}_ff.npy``) exists
in the reference README/BASELINE but not in its tree (SURVEY §2.8 note) —
implemented here from the surviving surface
(``Faceformer.extract_audio_motion_features``).

Latents are written as ``.safetensors`` by default (``--format pt`` writes
reference-compatible torch pickles) with the reference's metadata JSONs.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# Shared helpers (save_vae_latents.py:21-98)
# ---------------------------------------------------------------------------


def read_video(path: str) -> Tuple[List[np.ndarray], float]:
    """Decode to RGB uint8 numpy frames (PIL wrapping deferred to the resize
    so decode stays a plain memcpy; was 2x slower with per-frame
    Image.fromarray().convert())."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(np.ascontiguousarray(frame[..., ::-1]))
    cap.release()
    return frames, float(fps)


def preprocess_frames(
    frames: List, height: int, width: int, as_uint8: bool = False
) -> np.ndarray:
    """PIL-bicubic resize + [-1,1]; returns channels-last [1, F, H, W, 3].

    Accepts PIL images or RGB uint8 arrays. Resizes run on a thread pool
    (PIL's C resample releases the GIL) — the host decode+prep side must
    outrun the device encode for the double-buffered latent-extraction loop
    to stay device-bound (tools/perf_preprocess.py measures both sides).

    ``as_uint8``: skip the host-side normalize and return uint8 — 4x less
    host->device traffic; :class:`VAEEncoder` normalizes on-device inside
    the jit (same (x/255)*2-1 f32 math, identical to ULP — XLA may fuse
    the mul-sub into an FMA)."""
    if not frames:
        raise ValueError("No frames to process")

    def resize(im):
        if not isinstance(im, Image.Image):
            im = Image.fromarray(im)
        elif im.mode != "RGB":
            im = im.convert("RGB")
        return np.asarray(im.resize((width, height), Image.BICUBIC), np.uint8)

    if len(frames) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            processed = list(ex.map(resize, frames))
    else:
        processed = [resize(frames[0])]
    x = np.stack(processed, axis=0)
    if as_uint8:
        return x[None]
    xf = x.astype(np.float32)
    xf *= 2.0 / 255.0
    xf -= 1.0
    return xf[None]


def iter_clips(num_frames: int, clip_length: int, stride: int):
    clips = []
    i = 0
    while i < num_frames:
        j = i + clip_length
        if j > num_frames:
            break
        clips.append((i, j))
        if j == num_frames:
            break
        i += max(1, stride)
    return clips


def save_latents_and_meta(
    latents: np.ndarray,  # [1, F, H, W, C] channels-last
    out_dir: str,
    base_name: str,
    clip_idx: int,
    start_f: int,
    end_f: int,
    fps: float,
    vae_per_channel_normalize: bool,
    is_reference: bool = False,
    fmt: str = "safetensors",
):
    """save_vae_latents.py:65-98 format; latents stored in the reference's
    [1, C, F, H, W] layout for interchange."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = "_ref" if is_reference else ""
    ncfhw = np.ascontiguousarray(np.transpose(latents, (0, 4, 1, 2, 3)))

    if fmt == "pt":
        import torch

        torch.save(
            {"latents": torch.from_numpy(ncfhw)},
            os.path.join(out_dir, f"{base_name}_{clip_idx}{suffix}.pt"),
        )
    else:
        from avatar_tpu.utils.safetensors_io import save_safetensors

        save_safetensors(
            {"latents": ncfhw},
            os.path.join(out_dir, f"{base_name}_{clip_idx}{suffix}.safetensors"),
        )
    meta = {
        "video": base_name,
        "clip_index": clip_idx,
        "start_frame": int(start_f),
        "end_frame_exclusive": int(end_f),
        "fps": float(fps),
        "start_time_sec": float(start_f / max(fps, 1e-8)),
        "end_time_sec": float(end_f / max(fps, 1e-8)),
        "vae_per_channel_normalize": bool(vae_per_channel_normalize),
        "format": "torch.pt" if fmt == "pt" else "safetensors",
    }
    if is_reference:
        meta["is_reference"] = True
    with open(
        os.path.join(out_dir, f"{base_name}_{clip_idx}{suffix}.json"), "w"
    ) as f:
        json.dump(meta, f, indent=2)


class VAEEncoder:
    """Jitted VAE encoder from a single-file checkpoint."""

    def __init__(self, ckpt_path: str, precision: str = "bfloat16"):
        from avatar_tpu.models.vae import VAEConfig
        from avatar_tpu.utils.weight_import import (
            import_vae_state, load_single_file_checkpoint,
        )

        configs, _, v_state = load_single_file_checkpoint(ckpt_path)
        cfg = VAEConfig.from_dict(configs["vae"])
        self._setup(import_vae_state(v_state, cfg), cfg, precision)

    @classmethod
    def from_params(cls, params, cfg, precision: str = "bfloat16"):
        """Wrap an in-memory param tree (tests / perf tools / serving paths
        that already hold the weights) without a checkpoint file."""
        self = cls.__new__(cls)
        self._setup(params, cfg, precision)
        return self

    def _setup(self, params, cfg, precision: str):
        import jax
        import jax.numpy as jnp

        from avatar_tpu.models.vae import vae_encode

        self.cfg = cfg
        self.dtype = (
            jnp.bfloat16 if precision in ("bfloat16", "bf16") else jnp.float32
        )
        self.params = jax.tree.map(lambda x: x.astype(self.dtype), params)

        def encode(p, x, k, pcn):
            if x.dtype == jnp.uint8:
                # on-device normalize (preprocess_frames(as_uint8=True)
                # ships uint8 — 4x less H2D than f32): bit-equal to the
                # host path's (x/255)*2-1 in f32
                x = x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            x = x.astype(self.dtype)
            return vae_encode(p, self.cfg, x, key=k, per_channel_normalize=pcn)

        self._encode = jax.jit(encode, static_argnames=("pcn",))
        self._jax = jax

    def encode(self, media: np.ndarray, seed: int, per_channel: bool = True):
        x = self._jax.numpy.asarray(media)
        if x.dtype != self._jax.numpy.uint8:
            x = x.astype(self.dtype)
        return self._encode(
            self.params, x, self._jax.random.PRNGKey(seed), per_channel
        )


# ---------------------------------------------------------------------------
# save-vae-latents (save_vae_latents.py:101-186)
# ---------------------------------------------------------------------------


def _iter_preprocessed_clips(files, clip_length, stride, height, width,
                             prefetch: int = 2, stage=None):
    """Producer thread: host video decode + resize runs ahead of the device
    encode (the chip never waits on IO — 'saturate host->HBM' north star).

    ``stage``: optional second pipeline stage applied to each clip array on
    its own thread — cmd_save_vae_latents passes ``jax.device_put`` so the
    host->device transfer overlaps both the next clip's decode and the
    current encode (three-stage pipeline: decode | H2D | encode).

    Decode parallelism: up to 3 producer threads each own whole files
    (cv2/PIL release the GIL), so multi-video corpora keep the device
    encode fed even when one video's decode is slower than the encode."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 2))
    SENTINEL = object()
    file_q: "queue.Queue" = queue.Queue()
    for f in files:
        file_q.put(f)
    n_producers = max(1, min(3, len(files)))

    def producer():
        try:
            while True:
                try:
                    vid_path = file_q.get_nowait()
                except queue.Empty:
                    return
                frames, fps = read_video(vid_path)
                if not frames:
                    continue
                base = os.path.splitext(os.path.basename(vid_path))[0]
                for clip_idx, (s, e) in enumerate(
                    iter_clips(len(frames), clip_length, stride)
                ):
                    x = preprocess_frames(frames[s:e], height, width,
                                          as_uint8=True)
                    q.put((x, base, clip_idx, s, e, fps))
        finally:
            q.put(SENTINEL)

    for _ in range(n_producers):
        threading.Thread(target=producer, daemon=True).start()

    if stage is not None:
        q2: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 2))

        def stager():
            done = 0
            while done < n_producers:
                item = q.get()
                if item is SENTINEL:
                    done += 1
                    continue
                q2.put((stage(item[0]),) + item[1:])
            q2.put(SENTINEL)

        threading.Thread(target=stager, daemon=True).start()
        out_q, n_sentinels = q2, 1
    else:
        out_q, n_sentinels = q, n_producers

    done = 0
    while done < n_sentinels:
        item = out_q.get()
        if item is SENTINEL:
            done += 1
            continue
        yield item


def cmd_save_vae_latents(args):
    import numpy as np

    enc = VAEEncoder(args.ckpt)
    files: List[str] = []
    for inp in args.inputs:
        p = Path(inp)
        if p.is_dir():
            for ext in ("*.mp4", "*.mov", "*.mkv", "*.avi"):
                files.extend(str(pp) for pp in p.rglob(ext))
        else:
            files.append(str(p))

    import jax

    save_pixels = bool(getattr(args, "save_pixels", False))
    if save_pixels:
        os.makedirs(args.output_dir, exist_ok=True)
    # --save_pixels: keep the host uint8 clip alongside the staged device
    # copy so decoder fine-tuning targets ({stem}_pixels.npy, see
    # train/decoder.py) can be written without a device round-trip
    stage = (lambda x: (jax.device_put(x), x)) if save_pixels else jax.device_put

    pending = None  # (device_latents, save_args) — overlap encode with save IO
    for x, base, clip_idx, s, e, fps in _iter_preprocessed_clips(
        sorted(files), args.clip_length, args.stride, args.height, args.width,
        stage=stage,
    ):
        if save_pixels:
            x, host_pixels = x
            np.save(
                Path(args.output_dir) / f"{base}_{clip_idx}_pixels.npy",
                np.asarray(host_pixels[0], dtype=np.uint8),
            )
        lat = enc.encode(x, seed=clip_idx, per_channel=args.per_channel_normalize)
        if pending is not None:
            _flush_latents(*pending, fmt=args.format)
        pending = (
            np.asarray(lat, dtype=np.float32),
            (args.output_dir, base, clip_idx, s, e, fps,
             args.per_channel_normalize),
        )
        print(f"{base} clip {clip_idx}: latents {lat.shape}")
    if pending is not None:
        _flush_latents(*pending, fmt=args.format)


def _flush_latents(lat_np, save_args, fmt):
    out_dir, base, clip_idx, s, e, fps, pcn = save_args
    save_latents_and_meta(
        lat_np, out_dir, base, clip_idx, s, e, fps, pcn, fmt=fmt
    )


# ---------------------------------------------------------------------------
# save-condition-latents (save_condition_latents.py:85-392)
# ---------------------------------------------------------------------------


def load_transcripts(path: Optional[str]) -> Optional[Dict]:
    if not path:
        return None
    with open(path) as f:
        raw = json.load(f)
    return {Path(k).stem: v for k, v in raw.items() if isinstance(v, list)}


def get_clip_text(
    transcripts: Optional[Dict],
    video_base: str,
    start_time: float,
    end_time: float,
    default_text: str = "",
) -> str:
    """Word-level transcript slicing (save_condition_latents.py:91-138)."""
    if transcripts is None or video_base not in transcripts:
        return default_text
    clip_words = []
    for seg in transcripts[video_base]:
        if seg["start"] >= end_time or seg["end"] <= start_time:
            continue
        for w in seg.get("words", []):
            ws = w.get("start", seg["start"])
            we = w.get("end", seg["end"])
            if ws < end_time and we > start_time:
                clip_words.append(w.get("word", ""))
    result = " ".join(clip_words).strip()
    return result or default_text


def cmd_save_condition_latents(args):
    """Per clip: first frame -> reference png + face bbox; transcript text;
    FaceFormer pose-frame rendering matched to the clip length; metadata."""
    from avatar_tpu.pipelines.pose_frames import (
        detect_face_bbox, generate_faceformer_frames,
    )

    transcripts = load_transcripts(args.transcripts)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    files = []
    for inp in args.inputs:
        p = Path(inp)
        files.extend(
            [str(pp) for ext in ("*.mp4", "*.mov", "*.mkv", "*.avi")
             for pp in p.rglob(ext)] if p.is_dir() else [str(p)]
        )

    for vid_path in sorted(files):
        frames, fps = read_video(vid_path)
        base = Path(vid_path).stem
        for clip_idx, (s, e) in enumerate(
            iter_clips(len(frames), args.clip_length, args.stride)
        ):
            ref_image = Image.fromarray(frames[s]).resize(
                (args.width, args.height), Image.BICUBIC)
            try:
                bbox = detect_face_bbox(np.asarray(ref_image))
            except (ValueError, RuntimeError) as err:
                print(f"  skip {base}_{clip_idx}: {err}")
                continue
            text = get_clip_text(
                transcripts, base, s / fps, e / fps, args.default_text
            )
            poses_dir = out_dir / f"{base}_{clip_idx}_poses"
            generate_faceformer_frames(
                text or args.default_text,
                output_dir=poses_dir,
                faceformer_checkpoint=args.faceformer_checkpoint,
                template_path=args.flame_template,
                face_bbox=bbox,
                num_frames=e - s,
                height=args.height,
                width=args.width,
            )
            ref_path = out_dir / f"{base}_{clip_idx}_ref.png"
            ref_image.save(ref_path)
            meta = {
                "video": base,
                "clip_index": clip_idx,
                "start_frame": int(s),
                "end_frame_exclusive": int(e),
                "fps": float(fps),
                "start_time_sec": s / max(fps, 1e-8),
                "end_time_sec": e / max(fps, 1e-8),
                "reference_image": ref_path.name,
                "face_bbox": {
                    "x_min": bbox[0], "y_min": bbox[1],
                    "x_max": bbox[2], "y_max": bbox[3],
                },
                "pose_frames_dir": poses_dir.name,
                "num_pose_frames": len(list(poses_dir.glob("frame_*.png"))),
                "text": text,
                "format": "conditioning_data",
            }
            with open(out_dir / f"{base}_{clip_idx}.json", "w") as f:
                json.dump(meta, f, indent=2)
            print(f"{base} clip {clip_idx}: conditioning saved")


# ---------------------------------------------------------------------------
# save-condition-encoder-latents (save_condition_encoder_latents.py:34-298)
# ---------------------------------------------------------------------------


def load_pose_frames(poses_dir: Path, target_length: int = 57) -> List[Image.Image]:
    """Pad/truncate the frame_*.png sequence to the clip length
    (save_condition_encoder_latents.py:34-67)."""
    frame_files = sorted(poses_dir.glob("frame_*.png"))
    if not frame_files:
        raise ValueError(f"No pose frames found in {poses_dir}")
    frames = [Image.open(f).convert("RGB") for f in frame_files]
    if len(frames) > target_length:
        frames = frames[:target_length]
    while len(frames) < target_length:
        frames.append(frames[-1].copy())
    return frames


def cmd_save_condition_encoder_latents(args):
    enc = VAEEncoder(args.ckpt)
    cond_dir = Path(args.conditions_dir)
    out_dir = args.output_dir

    json_files = sorted(
        f for f in cond_dir.glob("*.json") if not f.name.endswith("_ref.json")
    )
    for jf in json_files:
        with open(jf) as f:
            meta = json.load(f)
        if meta.get("format") != "conditioning_data":
            continue
        base, clip_idx = meta["video"], meta["clip_index"]
        poses_dir = cond_dir / meta["pose_frames_dir"]
        frames = load_pose_frames(poses_dir, target_length=args.clip_length)
        x = preprocess_frames(frames, args.height, args.width)
        lat = enc.encode(x, seed=clip_idx, per_channel=args.per_channel_normalize)
        save_latents_and_meta(
            np.asarray(lat, np.float32), out_dir, base, clip_idx,
            meta["start_frame"], meta["end_frame_exclusive"], meta["fps"],
            args.per_channel_normalize, fmt=args.format,
        )
        print(f"  Saved pose latents: {base}_{clip_idx}")

        ref_img = Image.open(cond_dir / meta["reference_image"]).convert("RGB")
        x_ref = preprocess_frames([ref_img], args.height, args.width)
        lat_ref = enc.encode(
            x_ref, seed=10_000 + clip_idx, per_channel=args.per_channel_normalize
        )
        save_latents_and_meta(
            np.asarray(lat_ref, np.float32), out_dir, base, clip_idx,
            meta["start_frame"], meta["end_frame_exclusive"], meta["fps"],
            args.per_channel_normalize, is_reference=True, fmt=args.format,
        )
        print(f"  Saved reference latents: {base}_{clip_idx}_ref")


# ---------------------------------------------------------------------------
# save-video-clips (save_video_clips.py:85-148)
# ---------------------------------------------------------------------------


def cmd_save_video_clips(args):
    from avatar_tpu.data.media import write_video

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = []
    for inp in args.inputs:
        p = Path(inp)
        files.extend(
            [str(pp) for ext in ("*.mp4", "*.mov", "*.mkv", "*.avi")
             for pp in p.rglob(ext)] if p.is_dir() else [str(p)]
        )
    for vid_path in sorted(files):
        frames, fps = read_video(vid_path)
        base = Path(vid_path).stem
        for clip_idx, (s, e) in enumerate(
            iter_clips(len(frames), args.clip_length, args.stride)
        ):
            clip = preprocess_frames(frames[s:e], args.height, args.width)[0]
            write_video(
                out_dir / f"{base}_{clip_idx}.mp4", (clip + 1) / 2, fps=fps
            )
            print(f"{base} clip {clip_idx}: video saved")


# ---------------------------------------------------------------------------
# save-text-latents (the CLI missing from the reference tree; produces the
# {stem}_ff.npy FaceFormer audio latents per README.md:84 / BASELINE cfg 2)
# ---------------------------------------------------------------------------


def cmd_save_text_latents(args):
    import jax.numpy as jnp

    from avatar_tpu.models.faceformer import (
        extract_audio_motion_features, load_faceformer,
    )
    from avatar_tpu.pipelines.pose_frames import (
        MAX_AUDIO_SAMPLES, load_audio_16k, synthesize_tts,
    )

    ff_cfg, w2v_cfg, params = load_faceformer(args.faceformer_checkpoint)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    inputs = []
    for inp in args.inputs:
        p = Path(inp)
        inputs.extend(sorted(p.glob("*.wav")) if p.is_dir() else [p])

    for item in inputs:
        if str(item).endswith(".wav"):
            audio = load_audio_16k(item)
            stem = Path(item).stem
        else:  # a text file: synthesize
            text = Path(item).read_text().strip()
            wav = out_dir / f"{Path(item).stem}_tts.wav"
            synthesize_tts(text, wav)
            audio = load_audio_16k(wav)
            stem = Path(item).stem
        audio = audio[:MAX_AUDIO_SAMPLES]
        feats = extract_audio_motion_features(
            params, ff_cfg, w2v_cfg, jnp.asarray(audio[None])
        )
        np.save(out_dir / f"{stem}_ff.npy", np.asarray(feats[0], np.float32))
        print(f"{stem}: audio latents {feats.shape}")


# ---------------------------------------------------------------------------


def main():
    parser = argparse.ArgumentParser(description="avatar_tpu preprocessing")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p, ckpt=True):
        p.add_argument("--output_dir", type=str, required=True)
        p.add_argument("--clip_length", type=int, default=57)
        p.add_argument("--stride", type=int, default=57)
        p.add_argument("--height", type=int, default=192)
        p.add_argument("--width", type=int, default=320)
        p.add_argument("--format", type=str, default="safetensors",
                       choices=["safetensors", "pt"])
        p.add_argument("--per_channel_normalize", action="store_true",
                       default=True)
        if ckpt:
            p.add_argument("--ckpt", type=str, required=True,
                           help="LTX checkpoint (single-file safetensors)")

    p = sub.add_parser("save-vae-latents")
    p.add_argument("--inputs", type=str, nargs="+", required=True)
    p.add_argument("--save_pixels", action="store_true",
                   help="also save {stem}_pixels.npy uint8 targets for "
                        "decoder fine-tuning (train/decoder.py)")
    common(p)
    p.set_defaults(fn=cmd_save_vae_latents)

    p = sub.add_parser("save-condition-latents")
    p.add_argument("--inputs", type=str, nargs="+", required=True)
    p.add_argument("--transcripts", type=str, default=None)
    p.add_argument("--default_text", type=str,
                   default="Person speaking naturally")
    p.add_argument("--faceformer_checkpoint", type=str, required=True)
    p.add_argument("--flame_template", type=str, required=True)
    common(p, ckpt=False)
    p.set_defaults(fn=cmd_save_condition_latents)

    p = sub.add_parser("save-condition-encoder-latents")
    p.add_argument("--conditions_dir", type=str, required=True)
    common(p)
    p.set_defaults(fn=cmd_save_condition_encoder_latents)

    p = sub.add_parser("save-video-clips")
    p.add_argument("--inputs", type=str, nargs="+", required=True)
    common(p, ckpt=False)
    p.set_defaults(fn=cmd_save_video_clips)

    p = sub.add_parser("save-text-latents")
    p.add_argument("--inputs", type=str, nargs="+", required=True,
                   help="wav files/dirs or text files")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--faceformer_checkpoint", type=str, required=True)
    p.set_defaults(fn=cmd_save_text_latents)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
