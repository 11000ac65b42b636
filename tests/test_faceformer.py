"""FaceFormer + wav2vec2 golden parity vs torch oracles (tiny random configs,
no downloads)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from avatar_tpu.models.faceformer import (
    FaceFormerConfig,
    alibi_slopes,
    biased_causal_row,
    extract_audio_motion_features,
    faceformer_predict,
    import_faceformer_state,
    periodic_positional_encoding,
)
from avatar_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    import_wav2vec2_state,
    linear_interpolation,
    wav2vec2_encode,
)


def _tiny_w2v_torch():
    from transformers import Wav2Vec2Config as HFW2VConfig
    from transformers import Wav2Vec2Model as HFW2VModel

    hf_cfg = HFW2VConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    return HFW2VConfig, HFW2VModel(hf_cfg).eval(), hf_cfg


def test_linear_interpolation_matches_torch(rng):
    import torch.nn.functional as F

    x = rng.standard_normal((2, 37, 8)).astype(np.float32)
    ref = (
        F.interpolate(
            torch.from_numpy(x).transpose(1, 2), size=22,
            align_corners=True, mode="linear",
        )
        .transpose(1, 2)
        .numpy()
    )
    out = linear_interpolation(jnp.asarray(x), 50, 30, output_len=22)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_wav2vec2_matches_torch_reference_path(rng):
    """Parity with the reference's forked forward (wav2vec.py:79-182,
    vocaset): conv feats -> 50->30fps interpolation -> projection -> encoder,
    reproduced here from the HF torch submodules as the oracle."""
    import torch.nn.functional as F

    _, model, hf_cfg = _tiny_w2v_torch()
    audio = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    frame_num = 12

    with torch.no_grad():
        feats = model.feature_extractor(torch.from_numpy(audio))
        feats = feats.transpose(1, 2)  # [B, T, C]
        feats = (
            F.interpolate(
                feats.transpose(1, 2), size=frame_num,
                align_corners=True, mode="linear",
            ).transpose(1, 2)
        )
        proj = model.feature_projection(feats)
        hidden = proj[0] if isinstance(proj, tuple) else proj
        ref = model.encoder(hidden).last_hidden_state.numpy()

    cfg = Wav2Vec2Config.from_dict(hf_cfg.to_dict())
    state = {k: v.numpy() for k, v in model.state_dict().items()
             if "masked_spec_embed" not in k}
    params = import_wav2vec2_state(state, cfg)
    out = wav2vec2_encode(params, cfg, jnp.asarray(audio), output_len=frame_num)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def _torch_biased_mask(n_head, max_seq_len, period):
    """Literal reference construction (faceformer.py:8-40) as the oracle."""

    def get_slopes(n):
        def p2(n):
            start = 2 ** (-(2 ** -(math.log2(n) - 3)))
            return [start * start**i for i in range(n)]

        if math.log2(n).is_integer():
            return p2(n)
        closest = 2 ** math.floor(math.log2(n))
        return p2(closest) + get_slopes(2 * closest)[0::2][: n - closest]

    slopes = torch.Tensor(get_slopes(n_head))
    bias = (
        torch.arange(start=0, end=max_seq_len, step=period)
        .unsqueeze(1).repeat(1, period).view(-1) // period
    )
    bias = -torch.flip(bias, dims=[0])
    alibi = torch.zeros(max_seq_len, max_seq_len)
    for i in range(max_seq_len):
        alibi[i, : i + 1] = bias[-(i + 1):]
    alibi = slopes.unsqueeze(1).unsqueeze(1) * alibi.unsqueeze(0)
    mask = (torch.triu(torch.ones(max_seq_len, max_seq_len)) == 1).transpose(0, 1)
    mask = (
        mask.float()
        .masked_fill(mask == 0, float("-inf"))
        .masked_fill(mask == 1, 0.0)
    )
    return mask.unsqueeze(0) + alibi


def test_biased_mask_closed_form():
    """Our closed form -slope*floor((i-j)/period) equals the reference's
    literal mask construction."""
    n_head, seq, period = 4, 37, 5
    ref = _torch_biased_mask(n_head, seq, period).numpy()
    slopes = jnp.asarray(alibi_slopes(n_head), jnp.float32)
    for i in [0, 1, 7, 36]:
        row = np.asarray(biased_causal_row(slopes, jnp.asarray(i), seq, period))
        np.testing.assert_allclose(row, ref[:, i, :], atol=1e-6)


def test_ppe_matches_torch():
    d, period, maxlen = 16, 5, 40
    pe = torch.zeros(period, d)
    position = torch.arange(0, period, dtype=torch.float).unsqueeze(1)
    div = torch.exp(
        torch.arange(0, d, 2).float() * (-math.log(10000.0) / d)
    )
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    ref = pe.unsqueeze(0).repeat(1, maxlen // period + 1, 1)[0].numpy()
    ours = periodic_positional_encoding(d, period, maxlen)
    np.testing.assert_allclose(ours[: ref.shape[0]], ref, atol=1e-6)


class _TorchFaceformer(torch.nn.Module):
    """Oracle: the reference decoder stack around a torch TransformerDecoder
    (faceformer.py:77-238) with a stubbed audio encoder (we feed projected
    hidden states directly)."""

    def __init__(self, feature_dim=16, vertice_dim=24, period=5, n_head=4):
        super().__init__()
        self.feature_dim = feature_dim
        self.period = period
        self.vertice_map = torch.nn.Linear(vertice_dim, feature_dim)
        self.vertice_map_r = torch.nn.Linear(feature_dim, vertice_dim)
        self.obj_vector = torch.nn.Linear(8, feature_dim, bias=False)
        layer = torch.nn.TransformerDecoderLayer(
            d_model=feature_dim, nhead=n_head,
            dim_feedforward=2 * feature_dim, batch_first=True,
        )
        self.transformer_decoder = torch.nn.TransformerDecoder(layer, num_layers=1)
        self.biased_mask = _torch_biased_mask(n_head, 600, period)
        self.ppe = torch.from_numpy(
            periodic_positional_encoding(feature_dim, period, 600)
        )

    def predict_from_hidden(self, hidden_states, template, one_hot):
        obj_embedding = self.obj_vector(one_hot)
        frame_num = hidden_states.shape[1]
        template = template.unsqueeze(1)
        for i in range(frame_num):
            if i == 0:
                vertice_emb = obj_embedding.unsqueeze(1)
                style_emb = vertice_emb
                vertice_input = style_emb + self.ppe[: 1][None]
            else:
                vertice_input = vertice_emb + self.ppe[: vertice_emb.shape[1]][None]
            t = vertice_input.shape[1]
            tgt_mask = self.biased_mask[:, :t, :t]
            memory_mask = torch.ones(t, hidden_states.shape[1])
            for r in range(t):
                memory_mask[r, r] = 0
            memory_mask = memory_mask == 1
            out = self.transformer_decoder(
                vertice_input, hidden_states, tgt_mask=tgt_mask,
                memory_mask=memory_mask,
            )
            vertice_out = self.vertice_map_r(out)
            new_output = self.vertice_map(vertice_out[:, -1, :]).unsqueeze(1)
            new_output = new_output + style_emb
            vertice_emb = torch.cat((vertice_emb, new_output), 1)
        return vertice_out + template


def test_faceformer_decoder_matches_torch(rng):
    """Our single-query lax.scan decode must equal the reference's full
    prefix-redecode loop."""
    torch.manual_seed(1)
    oracle = _TorchFaceformer().eval()
    frames, fdim, vdim = 7, 16, 24
    hidden = rng.standard_normal((1, frames, fdim)).astype(np.float32)
    template = rng.standard_normal((1, vdim)).astype(np.float32)
    one_hot = np.zeros((1, 8), np.float32)
    one_hot[0, 2] = 1.0

    with torch.no_grad():
        ref = oracle.predict_from_hidden(
            torch.from_numpy(hidden), torch.from_numpy(template),
            torch.from_numpy(one_hot),
        ).numpy()

    # our params: import the decoder pieces from the oracle state dict
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    # fabricate the missing audio-side keys structure:
    from avatar_tpu.models.faceformer import FaceFormerConfig

    params = {
        "vertice_map": {
            "kernel": jnp.asarray(state["vertice_map.weight"].T),
            "bias": jnp.asarray(state["vertice_map.bias"]),
        },
        "vertice_map_r": {
            "kernel": jnp.asarray(state["vertice_map_r.weight"].T),
            "bias": jnp.asarray(state["vertice_map_r.bias"]),
        },
        "obj_vector": {"kernel": jnp.asarray(state["obj_vector.weight"].T)},
        "decoder_layer": {
            "self_attn": {
                "in_proj_weight": jnp.asarray(
                    state["transformer_decoder.layers.0.self_attn.in_proj_weight"]
                ),
                "in_proj_bias": jnp.asarray(
                    state["transformer_decoder.layers.0.self_attn.in_proj_bias"]
                ),
                "out_proj_weight": jnp.asarray(
                    state["transformer_decoder.layers.0.self_attn.out_proj.weight"]
                ),
                "out_proj_bias": jnp.asarray(
                    state["transformer_decoder.layers.0.self_attn.out_proj.bias"]
                ),
            },
            "multihead_attn": {
                "in_proj_weight": jnp.asarray(
                    state["transformer_decoder.layers.0.multihead_attn.in_proj_weight"]
                ),
                "in_proj_bias": jnp.asarray(
                    state["transformer_decoder.layers.0.multihead_attn.in_proj_bias"]
                ),
                "out_proj_weight": jnp.asarray(
                    state["transformer_decoder.layers.0.multihead_attn.out_proj.weight"]
                ),
                "out_proj_bias": jnp.asarray(
                    state["transformer_decoder.layers.0.multihead_attn.out_proj.bias"]
                ),
            },
            "linear1": {
                "kernel": jnp.asarray(
                    state["transformer_decoder.layers.0.linear1.weight"].T
                ),
                "bias": jnp.asarray(
                    state["transformer_decoder.layers.0.linear1.bias"]
                ),
            },
            "linear2": {
                "kernel": jnp.asarray(
                    state["transformer_decoder.layers.0.linear2.weight"].T
                ),
                "bias": jnp.asarray(
                    state["transformer_decoder.layers.0.linear2.bias"]
                ),
            },
            "norm1": {
                "scale": jnp.asarray(state["transformer_decoder.layers.0.norm1.weight"]),
                "bias": jnp.asarray(state["transformer_decoder.layers.0.norm1.bias"]),
            },
            "norm2": {
                "scale": jnp.asarray(state["transformer_decoder.layers.0.norm2.weight"]),
                "bias": jnp.asarray(state["transformer_decoder.layers.0.norm2.bias"]),
            },
            "norm3": {
                "scale": jnp.asarray(state["transformer_decoder.layers.0.norm3.weight"]),
                "bias": jnp.asarray(state["transformer_decoder.layers.0.norm3.bias"]),
            },
        },
    }
    cfg = FaceFormerConfig(feature_dim=fdim, vertice_dim=vdim, period=5)

    from avatar_tpu.models.faceformer import faceformer_decode
    from avatar_tpu.models.layers import linear as jlinear

    style = jnp.asarray(one_hot) @ params["obj_vector"]["kernel"]
    features = faceformer_decode(params, cfg, jnp.asarray(hidden), style)
    vertices = jlinear(params["vertice_map_r"], features) + jnp.asarray(template)[:, None]
    np.testing.assert_allclose(np.asarray(vertices), ref, atol=2e-4, rtol=1e-3)


def test_full_faceformer_import_and_predict(rng):
    """End-to-end import of a torch Faceformer-shaped state dict (tiny
    wav2vec2) and a jit-compiled predict + audio-feature extraction."""
    _, w2v_model, hf_cfg = _tiny_w2v_torch()
    torch.manual_seed(2)
    fdim, vdim = 16, 24
    dec = _TorchFaceformer(feature_dim=fdim, vertice_dim=vdim, period=5)
    audio_feature_map = torch.nn.Linear(hf_cfg.hidden_size, fdim)

    state = {}
    for k, v in w2v_model.state_dict().items():
        if "masked_spec_embed" in k:
            continue
        state[f"audio_encoder.{k}"] = v.numpy()
    state["audio_feature_map.weight"] = audio_feature_map.weight.detach().numpy()
    state["audio_feature_map.bias"] = audio_feature_map.bias.detach().numpy()
    for k, v in dec.state_dict().items():
        if k.startswith(("vertice_map", "obj_vector", "transformer_decoder")):
            state[k] = v.numpy()

    w2v_cfg = Wav2Vec2Config.from_dict(hf_cfg.to_dict())
    params = import_faceformer_state(state, w2v_cfg)
    ff_cfg = FaceFormerConfig(feature_dim=fdim, vertice_dim=vdim, period=5)

    audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32) * 0.1)
    template = jnp.zeros((1, vdim))
    one_hot = jnp.zeros((1, 8)).at[0, 0].set(1.0)
    verts = faceformer_predict(params, ff_cfg, w2v_cfg, audio, template, one_hot)
    assert verts.shape[0] == 1 and verts.shape[2] == vdim
    assert np.isfinite(np.asarray(verts)).all()

    feats = extract_audio_motion_features(params, ff_cfg, w2v_cfg, audio)
    assert feats.shape[:2] == verts.shape[:2] and feats.shape[2] == fdim
