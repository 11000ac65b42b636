"""End-to-end CLI tests on a synthetic checkpoint: train 2 epochs (with
resume), then run the inference path from the saved checkpoint — the
reference's tests/test_inference.py + test_configs.py strategy."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from avatar_tpu.models.dit import DiTConfig, init_dit
from avatar_tpu.models.vae import demo_config, init_vae
from avatar_tpu.utils.safetensors_io import save_safetensors
from avatar_tpu.utils.weight_import import (
    export_vae_state,
    save_single_file_checkpoint,
)

LATENT_CH = 8


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    """Tiny random single-file checkpoint (reference conftest.py:66-97)."""
    tmp = tmp_path_factory.mktemp("ckpt")
    dit_cfg = DiTConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=LATENT_CH,
        out_channels=LATENT_CH, num_layers=2, cross_attention_dim=16,
        caption_channels=32,
    )
    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=LATENT_CH),
        base_channels=32, decoder_base_channels=32,
    )
    dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    vae_params = init_vae(jax.random.PRNGKey(1), vae_cfg)
    vae_params["per_channel_statistics"] = {
        "std_of_means": jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 2, LATENT_CH).astype(np.float32)
        ),
        "mean_of_means": jnp.asarray(
            np.random.default_rng(1).normal(size=LATENT_CH).astype(np.float32)
        ),
    }
    path = tmp / "test_ckpt.safetensors"
    save_single_file_checkpoint(
        path, dit_params, dit_cfg,
        vae_state=export_vae_state(vae_params, vae_cfg),
        vae_config=vae_cfg.to_dict(),
        scheduler_config={
            "_class_name": "RectifiedFlowScheduler",
            "num_train_timesteps": 1000,
            "sampler": "Uniform",
            "shifting": "SD3",
            "target_shift_terminal": 0.1,
        },
    )
    return path, dit_cfg, vae_cfg


@pytest.fixture(scope="module")
def latent_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("latents")
    enc = tmp / "enc"
    cond = tmp / "cond"
    enc.mkdir(); cond.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        stem = f"clip_{i}"
        save_safetensors(
            {"latents": rng.standard_normal((LATENT_CH, 3, 2, 2)).astype(np.float32)},
            enc / f"{stem}.safetensors",
        )
        save_safetensors(
            {"latents": rng.standard_normal((LATENT_CH, 3, 2, 2)).astype(np.float32)},
            cond / f"{stem}.safetensors",
        )
        save_safetensors(
            {"latents": rng.standard_normal((LATENT_CH, 1, 2, 2)).astype(np.float32)},
            cond / f"{stem}_ref.safetensors",
        )
    return enc, cond


def test_train_cli_and_resume(tmp_path, synthetic_ckpt, latent_dirs):
    from avatar_tpu.cli.train import train_loop
    from avatar_tpu.core.config import TrainConfig

    ckpt_path, _, _ = synthetic_ckpt
    enc, cond = latent_dirs
    out_dir = tmp_path / "run"
    cfg = TrainConfig(
        checkpoint_path=str(ckpt_path),
        condition_latents_dir=str(cond),
        encoder_latents_dir=str(enc),
        val_condition_latents_dir=str(cond),
        val_encoder_latents_dir=str(enc),
        output_dir=str(out_dir),
        batch_size=2, num_epochs=2, learning_rate=1e-3,
        lora_rank=2, lora_alpha=2, gradient_accumulation_steps=2,
        precision="float32", train_mode="lora_audio",
        rf_log_normal_mu=-0.5, rf_log_normal_sigma=1.0,
        log_every_n_steps=1, save_every_n_epochs=1,
        wandb_project=None,
        # production-trainer extras ride the same loop (clip + warmup/cosine
        # + param EMA with per-epoch EMA checkpoint export)
        max_grad_norm=1.0, lr_schedule="cosine", lr_warmup_steps=1,
        ema_decay=0.99,
    )
    train_loop(cfg, resume=False)

    # exported checkpoints + metrics exist
    assert (out_dir / "model_epoch_1.safetensors").exists() or (
        out_dir / "best_model_epoch_1.safetensors"
    ).exists()
    assert (out_dir / "model_epoch_1_ema.safetensors").exists()
    metrics = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train/loss" in m for m in metrics)
    assert any("val/loss" in m for m in metrics)

    # resume continues from the saved state (epoch 2 -> nothing new to do,
    # extend by one epoch and check it runs)
    cfg.num_epochs = 3
    train_loop(cfg, resume=True)


def test_train_cli_pp(tmp_path, synthetic_ckpt, latent_dirs):
    """sharding_mode=pp end-to-end through the CLI train loop: pp mesh,
    stacked/stage-sharded blocks, derived optimizer shardings, and the
    canonical (unstacked) checkpoint export."""
    from avatar_tpu.cli.train import train_loop
    from avatar_tpu.core.config import TrainConfig

    ckpt_path, _, _ = synthetic_ckpt
    enc, cond = latent_dirs
    out_dir = tmp_path / "run_pp"
    cfg = TrainConfig(
        checkpoint_path=str(ckpt_path),
        condition_latents_dir=str(cond),
        encoder_latents_dir=str(enc),
        output_dir=str(out_dir),
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        lora_rank=2, lora_alpha=2, gradient_accumulation_steps=2,
        precision="float32", train_mode="lora_audio",
        rf_log_normal_mu=-0.5, rf_log_normal_sigma=1.0,
        log_every_n_steps=1, save_every_n_epochs=1,
        wandb_project=None,
        sharding_mode="pp", pp_stages=2, pp_microbatches=2,
    )
    train_loop(cfg, resume=False)
    assert (out_dir / "model_epoch_1.safetensors").exists() or (
        out_dir / "best_model_epoch_1.safetensors"
    ).exists()
    metrics = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train/loss" in m for m in metrics)


def test_train_cli_sp(tmp_path, synthetic_ckpt, latent_dirs):
    """sharding_mode=sp end-to-end through the CLI train loop: ('data','sp')
    mesh, replicated params/trainable/optimizer, token axis sharded through
    ring attention (2 heads on an sp=4 axis — past Ulysses' head limit),
    batches sharded over 'data'."""
    from avatar_tpu.cli.train import train_loop
    from avatar_tpu.core.config import TrainConfig

    ckpt_path, _, _ = synthetic_ckpt
    enc, cond = latent_dirs
    out_dir = tmp_path / "run_sp"
    cfg = TrainConfig(
        checkpoint_path=str(ckpt_path),
        condition_latents_dir=str(cond),
        encoder_latents_dir=str(enc),
        output_dir=str(out_dir),
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        lora_rank=2, lora_alpha=2, gradient_accumulation_steps=2,
        precision="float32", train_mode="lora_audio",
        rf_log_normal_mu=-0.5, rf_log_normal_sigma=1.0,
        log_every_n_steps=1, save_every_n_epochs=1,
        wandb_project=None,
        sharding_mode="sp", sp_impl="ring", mesh_data=2,
    )
    train_loop(cfg, resume=False)
    assert (out_dir / "model_epoch_1.safetensors").exists() or (
        out_dir / "best_model_epoch_1.safetensors"
    ).exists()
    metrics = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train/loss" in m for m in metrics)


def test_exported_checkpoint_runs_inference(tmp_path, synthetic_ckpt):
    """create_ltx_video_pipeline from the synthetic single-file checkpoint,
    then a 2-step generation (test_inference.py smoke semantics)."""
    from avatar_tpu.cli.infer import create_ltx_video_pipeline
    from avatar_tpu.pipelines import GenerationParams

    ckpt_path, dit_cfg, vae_cfg = synthetic_ckpt
    pipe = create_ltx_video_pipeline(
        str(ckpt_path), precision="float32", sampler="from_checkpoint",
        attention_impl="xla",
    )
    assert pipe.schedule.shifting == "SD3"
    embeds = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    mask = jnp.ones((1, 8))
    out = pipe(
        GenerationParams(
            height=64, width=64, num_frames=8, num_inference_steps=2,
            guidance_scale=1.0, stg_scale=0.0, rescaling_scale=1.0,
            decode_timestep=0.05,
        ),
        jax.random.PRNGKey(1), embeds, mask, dtype=jnp.float32,
    )
    assert out.shape == (1, 9, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # quantization plumb-through: the yaml "quantization" /
    # "quantization_vae" knobs
    pipe_q = create_ltx_video_pipeline(
        str(ckpt_path), precision="float32", sampler="from_checkpoint",
        attention_impl="xla", quantize="w8a8", quantize_vae="w8a8",
    )
    assert "kernel_q8" in pipe_q.dit_params["blocks"][0]["ff"]["proj_in"]
    q_convs = []
    def _walk(t):
        if isinstance(t, dict):
            if "kernel_q8" in t and getattr(t["kernel_q8"], "ndim", 0) == 5:
                q_convs.append(t)
            for v in t.values():
                _walk(v)
        elif isinstance(t, list):
            for v in t:
                _walk(v)
    _walk(pipe_q.vae_params)
    assert q_convs, "quantize_vae did not reach the VAE conv tree"
    out_q = pipe_q(
        GenerationParams(
            height=64, width=64, num_frames=8, num_inference_steps=2,
            guidance_scale=1.0, stg_scale=0.0, rescaling_scale=1.0,
            decode_timestep=0.05,
        ),
        jax.random.PRNGKey(1), embeds, mask, dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(out_q)).all()
    assert np.abs(np.asarray(out_q) - np.asarray(out)).mean() < 0.05


def test_pipeline_config_yamls_load():
    """Every shipped yaml parses and covers the reference knobs
    (test_configs.py parity at the schema level)."""
    for name in (
        "configs/inference-avatars.yaml",
        "configs/ltxv-2b-0.9.6-dev.yaml",
    ):
        with open(name) as f:
            cfg = yaml.safe_load(f)
        for key in ("checkpoint_path", "guidance_scale", "stg_scale",
                    "num_inference_steps", "decode_timestep", "stg_mode",
                    "precision", "sampler"):
            assert key in cfg, (name, key)

    from avatar_tpu.core.config import load_train_config_from_yaml

    tc = load_train_config_from_yaml("configs/train-avatars.yaml")
    assert tc.batch_size == 8 and tc.lora_rank == 32
    assert tc.gradient_accumulation_steps == 16
    assert tc.rf_log_normal_mu == -0.5
    assert tc.sharding_mode == "dp" and tc.pp_stages == 1  # pp opt-in only


_SHIPPED_YAMLS = sorted(
    __import__("pathlib").Path(__file__).resolve().parents[1]
    .joinpath("configs").glob("*.yaml")
)
assert _SHIPPED_YAMLS, "configs/ sweep collected zero yamls"  # never vacuous


@pytest.mark.parametrize(
    "config_path", _SHIPPED_YAMLS, ids=lambda p: p.stem,
)
def test_every_shipped_config_runs_generation(tmp_path, config_path,
                                              synthetic_ckpt):
    """Reference tests/test_configs.py:15-30 semantics: every shipped yaml
    goes through the real CLI generate path end-to-end. The real 2B
    checkpoint is not downloadable here, so the sweep overrides ONLY the
    environment-bound knobs (checkpoint path, steps, skip_block_list layer
    index, geometry) and keeps every behavioral knob — guidance/stg scales,
    stg_mode, rescaling, sampler, decode timestep/noise — as shipped."""
    cfg = yaml.safe_load(config_path.read_text())
    if "optimizer" in cfg or config_path.stem.startswith("train"):
        # the training operating point goes through the train loader + a
        # 1-epoch loop elsewhere (test_train_cli_and_resume); here just
        # assert the shipped file loads through the real loader.
        from avatar_tpu.core.config import load_train_config_from_yaml

        tc = load_train_config_from_yaml(str(config_path))
        assert tc.batch_size > 0
        return

    from avatar_tpu.cli.infer import InferenceConfig, infer

    ckpt_path, dit_cfg, _ = synthetic_ckpt
    cfg["checkpoint_path"] = str(ckpt_path)
    cfg.pop("vae_checkpoint_path", None)  # single-file ckpt carries the VAE
    cfg["precision"] = "float32"
    cfg["num_inference_steps"] = 2
    if cfg.get("skip_block_list"):
        # shipped index 19 targets the 28-layer 2B model; remap into the
        # tiny fixture's layer range, keeping STG exercise intact
        cfg["skip_block_list"] = [dit_cfg.num_layers - 1]
    tmp_yaml = tmp_path / config_path.name
    tmp_yaml.write_text(yaml.safe_dump(cfg))

    rng = np.random.default_rng(11)
    embeds_path = tmp_path / "embeds.safetensors"
    save_safetensors(
        {
            "prompt_embeds": rng.normal(
                size=(1, 8, dit_cfg.caption_channels)
            ).astype(np.float32),
            "prompt_attention_mask": np.ones((1, 8), np.float32),
        },
        embeds_path,
    )
    out_dir = infer(InferenceConfig(
        prompt="A video of a cat playing with a ball.",
        output_path=str(tmp_path / "out"),
        pipeline_config=str(tmp_yaml),
        seed=7, height=64, width=64, num_frames=9, frame_rate=20,
        prompt_embeds_path=str(embeds_path),
    ))
    videos = list(out_dir.glob("*.mp4"))
    assert len(videos) == 1, (config_path.stem, list(out_dir.iterdir()))
    from avatar_tpu.data.media import read_video_frames

    frames = list(read_video_frames(videos[0]))
    assert len(frames) == 9 and frames[0].shape == (64, 64, 3)


def test_media_io_roundtrip(tmp_path):
    from PIL import Image

    from avatar_tpu.data.media import (
        calculate_padding, load_media_file, pad_media, unpad_media, write_video,
    )

    rng = np.random.default_rng(0)
    img = (rng.random((100, 160, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "img.png")

    padding = calculate_padding(96, 128, 128, 160)
    media = load_media_file(str(tmp_path / "img.png"), 96, 128, padding)
    assert media.shape == (1, 1, 128, 160, 3)
    assert -1.01 <= media.min() and media.max() <= 1.01

    unpadded = unpad_media(media, padding)
    assert unpadded.shape == (1, 1, 96, 128, 3)

    video = rng.random((5, 32, 32, 3)).astype(np.float32)
    write_video(tmp_path / "out.mp4", video, fps=5)
    assert (tmp_path / "out.mp4").stat().st_size > 0


def test_pose_frame_rendering(tmp_path):
    from avatar_tpu.pipelines.pose_frames import (
        FLAME_51_STATIC_LANDMARK_INDICES, adjust_num_frames, render_frame,
    )

    assert len(FLAME_51_STATIC_LANDMARK_INDICES) == 42  # 51 minus nose block
    rng = np.random.default_rng(0)
    vertices = rng.standard_normal((5023, 3)).astype(np.float32) * 0.1
    from PIL import Image

    imgs = {}
    for renderer in ("cv2", "matplotlib"):
        out = tmp_path / f"frame_{renderer}.png"
        render_frame(vertices, out, height=64, width=64,
                     face_bbox=(0.25, 0.25, 0.75, 0.75), renderer=renderer)
        img = np.asarray(Image.open(out).convert("RGB"))
        assert img.shape == (64, 64, 3)
        assert img.max() > 100  # white dots present
        assert np.median(img) == 0  # black background
        imgs[renderer] = img.astype(np.float32).mean(-1)

    # same projection: the dot clouds must coincide (centroid within 1px,
    # per-pixel difference only at anti-aliased dot edges)
    def centroid(im):
        ys, xs = np.nonzero(im > 10)
        return xs.mean(), ys.mean()

    c_cv, c_mpl = centroid(imgs["cv2"]), centroid(imgs["matplotlib"])
    assert abs(c_cv[0] - c_mpl[0]) < 1.0 and abs(c_cv[1] - c_mpl[1]) < 1.0
    lit_cv = (imgs["cv2"] > 10).sum()
    lit_mpl = (imgs["matplotlib"] > 10).sum()
    assert 0.5 < lit_cv / lit_mpl < 2.0, (lit_cv, lit_mpl)

    # frame-count adjustment: N*8+1 (ref formula ((n-2)//8+1)*8+1), capped
    assert adjust_num_frames(100, None, 20, 30) == 73  # int(100*20/30)=66 -> 73
    assert adjust_num_frames(10, None, 20, 30) == 9
    assert adjust_num_frames(100, 33, 20, 30) == 33


def test_detect_face_bbox_gating():
    """Without mediapipe/Haar data this must fail with a clear actionable
    error (not an AttributeError); with a backend it must report no-face."""
    from avatar_tpu.pipelines.pose_frames import detect_face_bbox

    blank = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises((ValueError, RuntimeError), match="face"):
        detect_face_bbox(blank)


def test_generate_faceformer_frames_e2e(tmp_path):
    """Full pose-frame path: synthetic vocaset-style torch checkpoint +
    wav -> FaceFormer predict -> rendered frame directory (N*8+1 frames)."""
    torch = pytest.importorskip("torch")
    from scipy.io import wavfile

    from tests.test_faceformer import _TorchFaceformer, _tiny_w2v_torch
    from avatar_tpu.models.wav2vec2 import Wav2Vec2Config
    from avatar_tpu.pipelines.pose_frames import generate_faceformer_frames

    # synthetic checkpoint (tiny wav2vec2 + tiny decoder, vocaset layout)
    _, w2v_model, hf_cfg = _tiny_w2v_torch()
    n_verts = 80
    dec = _TorchFaceformer(feature_dim=16, vertice_dim=n_verts * 3, period=5)
    audio_feature_map = torch.nn.Linear(hf_cfg.hidden_size, 16)
    state = {
        f"audio_encoder.{k}": v
        for k, v in w2v_model.state_dict().items()
        if "masked_spec_embed" not in k
    }
    state["audio_feature_map.weight"] = audio_feature_map.weight.detach()
    state["audio_feature_map.bias"] = audio_feature_map.bias.detach()
    for k, v in dec.state_dict().items():
        if k.startswith(("vertice_map", "obj_vector", "transformer_decoder")):
            state[k] = v
    ckpt = tmp_path / "vocaset.pth"
    torch.save(state, ckpt)

    # synthetic 0.5 s 16 kHz wav + template
    rng = np.random.default_rng(0)
    wavfile.write(
        tmp_path / "speech.wav", 16000,
        (rng.standard_normal(8000) * 3000).astype(np.int16),
    )
    np.save(tmp_path / "template.npy",
            rng.standard_normal((n_verts, 3)).astype(np.float32) * 0.1)

    import unittest.mock as mock

    import avatar_tpu.models.faceformer as ff_mod
    from avatar_tpu.models.faceformer import FaceFormerConfig, import_faceformer_state

    w2v_cfg = Wav2Vec2Config.from_dict(hf_cfg.to_dict())

    def tiny_load(path):
        st = torch.load(path, map_location="cpu", weights_only=False)
        st = {k: v.numpy() for k, v in st.items()}
        return (
            FaceFormerConfig(feature_dim=16, vertice_dim=n_verts * 3, period=5),
            w2v_cfg,
            import_faceformer_state(st, w2v_cfg),
        )

    with mock.patch.object(ff_mod, "load_faceformer", tiny_load):
        frames_dir = generate_faceformer_frames(
            audio_path=tmp_path / "speech.wav",
            output_dir=tmp_path / "frames",
            faceformer_checkpoint=str(ckpt),
            template_path=str(tmp_path / "template.npy"),
            face_bbox=(0.25, 0.25, 0.75, 0.75),
            num_frames=17,  # explicit N*8+1 (the tiny conv stack's nominal
            target_fps=20,  # fps makes the automatic count meaningless)
            height=64, width=64,
        )
    frames = sorted(frames_dir.glob("frame_*.png"))
    assert len(frames) == 17
    from PIL import Image

    img = np.asarray(Image.open(frames[0]).convert("RGB"))
    assert img.shape == (64, 64, 3) and img.max() > 100


def test_infer_cli_long_video(tmp_path, synthetic_ckpt):
    """Full infer() e2e through the long-video windowed path: precomputed
    prompt embeds, ref image + 25-frame pose dir (num_frames follows the
    pose dir, inference.py:365 parity), window_frames=17 -> two overlapping
    windows -> one stitched 25-frame mp4."""
    from PIL import Image

    from avatar_tpu.cli.infer import InferenceConfig, infer

    ckpt_path, dit_cfg, _ = synthetic_ckpt
    rng = np.random.default_rng(5)

    ref_path = tmp_path / "ref.png"
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
    ).save(ref_path)
    pose_dir = tmp_path / "pose"
    pose_dir.mkdir()
    for i in range(25):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        ).save(pose_dir / f"frame_{i:04d}.png")

    embeds_path = tmp_path / "embeds.safetensors"
    save_safetensors(
        {
            "prompt_embeds": rng.normal(
                size=(1, 8, dit_cfg.caption_channels)
            ).astype(np.float32),
            "prompt_attention_mask": np.ones((1, 8), np.float32),
        },
        embeds_path,
    )

    cfg_path = tmp_path / "pipeline.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "checkpoint_path": str(ckpt_path),
        "precision": "float32",
        "sampler": "from_checkpoint",
        "num_inference_steps": 2,
        "guidance_scale": 1.0,
        "stg_scale": 0.0,
        "rescaling_scale": 1.0,
        "decode_timestep": 0.05,
        "overlap_frames": 9,
    }))

    out_dir = infer(InferenceConfig(
        prompt="",
        output_path=str(tmp_path / "out"),
        pipeline_config=str(cfg_path),
        seed=7, height=64, width=64, frame_rate=20,
        conditioning_media_paths=[str(ref_path), str(pose_dir)],
        prompt_embeds_path=str(embeds_path),
        window_frames=17,
    ))
    videos = list(out_dir.glob("*.mp4"))
    assert len(videos) == 1
    assert "x25" in videos[0].name  # trimmed to the pose-dir frame count

    from avatar_tpu.data.media import read_video_frames

    frames = list(read_video_frames(videos[0]))
    assert len(frames) == 25
    assert frames[0].shape == (64, 64, 3)


def test_scan_blocks_cli_plumb_through(synthetic_ckpt):
    """yaml `scan_blocks` knob: create_ltx_video_pipeline stacks the blocks
    (composing with w8a8 quantization) and the 2-step generation matches the
    unrolled pipeline in f32."""
    from avatar_tpu.cli.infer import create_ltx_video_pipeline
    from avatar_tpu.pipelines import GenerationParams

    ckpt_path, _, _ = synthetic_ckpt
    kw = dict(precision="float32", sampler="from_checkpoint",
              attention_impl="xla", quantize="w8a8")
    pipe = create_ltx_video_pipeline(str(ckpt_path), **kw)
    pipe_s = create_ltx_video_pipeline(str(ckpt_path), scan_blocks=True, **kw)
    assert not isinstance(pipe_s.dit_params["blocks"], list)
    assert "kernel_q8" in pipe_s.dit_params["blocks"]["ff"]["proj_in"]

    p = GenerationParams(
        height=64, width=64, num_frames=8, num_inference_steps=2,
        guidance_scale=1.0, stg_scale=0.0, rescaling_scale=1.0,
        decode_timestep=0.05,
    )
    embeds = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    mask = jnp.ones((1, 8))
    out = pipe(p, jax.random.PRNGKey(1), embeds, mask, dtype=jnp.float32)
    out_s = pipe_s(p, jax.random.PRNGKey(1), embeds, mask, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_s), atol=1e-4)
