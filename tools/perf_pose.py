"""Audio->pose-frame generation perf at real vocaset shapes (BASELINE
config 2 path: generate_faceformer_frames.py:305-436).

Random weights at the true model sizes: wav2vec2-base (95M, HF torch
random init exported through the same state-dict importer real checkpoints
use) + the 1-layer FaceFormer decoder (vertice_dim 15069).  Measures:

  - faceformer_predict on TPU (wav2vec2 encode + O(F) lax.scan decode)
  - extract_audio_motion_features (the audio-latent path)
  - host landmark render (matplotlib, per frame — the reference renders
    all frames host-side; ours does too, it is not on the device path)
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

AUDIO_S = 10.0  # seconds at 16 kHz -> 300 pose frames at 30 fps
FPS = 30


def build_params():
    import torch
    from transformers import Wav2Vec2Config as HFW2VConfig
    from transformers import Wav2Vec2Model

    from avatar_tpu.models.faceformer import (
        FaceFormerConfig, import_faceformer_state,
    )
    from avatar_tpu.models.wav2vec2 import Wav2Vec2Config

    torch.manual_seed(0)
    hf = Wav2Vec2Model(HFW2VConfig())  # wav2vec2-base-960h shape
    state = {f"audio_encoder.{k}": v.numpy()
             for k, v in hf.state_dict().items()}

    ff_cfg = FaceFormerConfig()
    rng = np.random.default_rng(0)
    d, v, nid = ff_cfg.feature_dim, ff_cfg.vertice_dim, ff_cfg.num_identities

    def w(*shape, scale=0.02):
        return rng.standard_normal(shape).astype(np.float32) * scale

    state.update({
        "audio_feature_map.weight": w(d, 768),
        "audio_feature_map.bias": w(d),
        "vertice_map.weight": w(d, v),
        "vertice_map_r.weight": w(v, d),
        "vertice_map_r.bias": w(v),
        "obj_vector.weight": w(d, nid),
    })
    dec = "transformer_decoder.layers.0"
    state.update({
        f"{dec}.self_attn.in_proj_weight": w(3 * d, d),
        f"{dec}.self_attn.in_proj_bias": w(3 * d),
        f"{dec}.self_attn.out_proj.weight": w(d, d),
        f"{dec}.self_attn.out_proj.bias": w(d),
        f"{dec}.multihead_attn.in_proj_weight": w(3 * d, d),
        f"{dec}.multihead_attn.in_proj_bias": w(3 * d),
        f"{dec}.multihead_attn.out_proj.weight": w(d, d),
        f"{dec}.multihead_attn.out_proj.bias": w(d),
        f"{dec}.linear1.weight": w(2048, d),
        f"{dec}.linear1.bias": w(2048),
        f"{dec}.linear2.weight": w(d, 2048),
        f"{dec}.linear2.bias": w(d),
        f"{dec}.norm1.weight": np.ones(d, np.float32),
        f"{dec}.norm1.bias": np.zeros(d, np.float32),
        f"{dec}.norm2.weight": np.ones(d, np.float32),
        f"{dec}.norm2.bias": np.zeros(d, np.float32),
        f"{dec}.norm3.weight": np.ones(d, np.float32),
        f"{dec}.norm3.bias": np.zeros(d, np.float32),
    })
    w2v_cfg = Wav2Vec2Config()
    return ff_cfg, w2v_cfg, import_faceformer_state(state, w2v_cfg)


def main():
    from avatar_tpu.models.faceformer import (
        extract_audio_motion_features, faceformer_predict,
    )
    from avatar_tpu.pipelines.pose_frames import render_frame

    ff_cfg, w2v_cfg, params = build_params()
    n_params = sum(x.size for x in jax.tree.leaves(params))
    frames = int(AUDIO_S * FPS)
    audio = np.asarray(
        np.sin(np.arange(int(AUDIO_S * 16000)) * 0.03), np.float32)[None]
    template = np.zeros((1, ff_cfg.vertice_dim), np.float32)
    one_hot = np.eye(ff_cfg.num_identities, dtype=np.float32)[:1]

    predict = jax.jit(
        lambda p, a, t, o: faceformer_predict(
            p, ff_cfg, w2v_cfg, a, t, o, frame_num=frames),
    )
    feats_fn = jax.jit(
        lambda p, a: extract_audio_motion_features(
            p, ff_cfg, w2v_cfg, a, frame_num=frames),
    )

    t0 = time.perf_counter()
    verts = predict(params, audio, template, one_hot)
    float(jnp.sum(verts))
    compile_s = time.perf_counter() - t0

    def timed(fn, *a):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_pred = timed(predict, params, audio, template, one_hot)
    print(f"faceformer_predict ({n_params/1e6:.0f}M params, {AUDIO_S:.0f}s "
          f"audio -> {frames} frames): {t_pred*1e3:.0f} ms "
          f"({frames/t_pred:.0f} pose-frames/s, {AUDIO_S/t_pred:.1f}x "
          f"realtime; compile {compile_s:.0f}s)", flush=True)

    feats = feats_fn(params, audio)
    t_feat = timed(feats_fn, params, audio)
    print(f"extract_audio_motion_features: {t_feat*1e3:.0f} ms "
          f"(features {tuple(feats.shape)})", flush=True)

    # host render (per frame, independent of the device)
    v0 = np.asarray(verts[0, 0]).reshape(-1, 3)
    tmp = tempfile.mkdtemp()
    for renderer, n_render in (("cv2", 50), ("matplotlib", 10)):
        t0 = time.perf_counter()
        for i in range(n_render):
            render_frame(v0, os.path.join(tmp, f"f{i}.png"), 512, 512,
                         (0.3, 0.2, 0.7, 0.6), renderer=renderer)
        t_render = (time.perf_counter() - t0) / n_render
        print(f"host render_frame[{renderer}]: {t_render*1e3:.1f} ms/frame "
              f"({1/t_render:.0f} f/s single-core; {frames} frames = "
              f"{frames*t_render:.1f}s host work per {AUDIO_S:.0f}s clip)",
              flush=True)


if __name__ == "__main__":
    main()
