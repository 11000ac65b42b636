"""Checkpoint import/export tests: export->import roundtrip must be exact,
the synthetic single-file checkpoint (reference conftest format) must load,
strict mode must reject unknown keys, and loaded params must run forward."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
from avatar_tpu.models.vae import (
    demo_config,
    encoder_apply,
    init_vae,
    posterior_mode,
)
from avatar_tpu.ops.rope import get_latent_coords
from avatar_tpu.utils.safetensors_io import load_config_metadata
from avatar_tpu.utils.weight_import import (
    export_transformer_state,
    export_vae_state,
    import_transformer_state,
    import_vae_state,
    load_checkpoint,
    save_single_file_checkpoint,
)

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def tiny_dit():
    cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=12, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=48,
        caption_channels=96,
    )
    return cfg, init_dit(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def tiny_vae():
    import dataclasses

    cfg = dataclasses.replace(
        demo_config(latent_channels=16), base_channels=32, decoder_base_channels=32
    )
    return cfg, init_vae(jax.random.PRNGKey(1), cfg)


def _trees_equal(a, b, path=""):
    assert type(a) is type(b), f"type mismatch at {path}"
    if isinstance(a, dict):
        assert set(a) == set(b), f"keys differ at {path}: {set(a) ^ set(b)}"
        for k in a:
            _trees_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b)
        for i, (x, y) in enumerate(zip(a, b)):
            _trees_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32),
            np.asarray(b, dtype=np.float32),
            atol=0, rtol=0, err_msg=path,
        )


def test_transformer_roundtrip(tiny_dit):
    cfg, params = tiny_dit
    state = export_transformer_state(params, cfg)
    back = import_transformer_state(state, cfg)
    _trees_equal(params, back)


def test_vae_roundtrip(tiny_vae):
    cfg, params = tiny_vae
    state = export_vae_state(params, cfg)
    back = import_vae_state(state, cfg)
    _trees_equal(params, back)


def test_strict_rejects_unknown_keys(tiny_dit):
    cfg, params = tiny_dit
    state = export_transformer_state(params, cfg)
    state["totally.unknown.key"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="Unconsumed"):
        import_transformer_state(state, cfg)
    import_transformer_state(state, cfg, strict=False)  # tolerant mode


def test_single_file_checkpoint_roundtrip(tmp_path, tiny_dit, tiny_vae):
    """Write a reference-format single-file checkpoint (prefixes + embedded
    config metadata, conftest.py:70-97 layout) and load it back end-to-end."""
    dit_cfg, dit_params = tiny_dit
    vae_cfg, vae_params = tiny_vae
    vae_params = dict(vae_params)
    vae_params["per_channel_statistics"] = {
        "std_of_means": jnp.asarray(np.random.default_rng(0).uniform(0.5, 2, 16).astype(np.float32)),
        "mean_of_means": jnp.asarray(np.random.default_rng(1).normal(size=16).astype(np.float32)),
    }
    path = tmp_path / "ckpt.safetensors"
    save_single_file_checkpoint(
        path, dit_params, dit_cfg,
        vae_state=export_vae_state(vae_params, vae_cfg),
        vae_config=vae_cfg.to_dict(),
        scheduler_config={"_class_name": "RectifiedFlowScheduler",
                          "num_train_timesteps": 1000, "sampler": "Uniform",
                          "shifting": "SD3", "target_shift_terminal": 0.1},
    )

    configs = load_config_metadata(path)
    assert set(configs) == {"transformer", "vae", "scheduler"}

    dit_cfg2, dit_params2, vae_cfg2, vae_params2, sched_cfg = load_checkpoint(path)
    assert dit_cfg2.num_layers == dit_cfg.num_layers
    assert vae_cfg2.latent_channels == 16
    assert sched_cfg["shifting"] == "SD3"
    _trees_equal(dit_params, dit_params2)
    _trees_equal(vae_params, vae_params2)

    # loaded params run forward
    tokens = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 16))
    grid = get_latent_coords(3, 2, 2, batch_size=1)
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 96))
    out = dit_apply(
        dit_params2, dit_cfg2, tokens, grid, jnp.asarray([0.5]),
        text, jnp.ones((1, 8)), attention_impl="xla",
    )
    assert out.shape == (1, 12, 16)

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 32, 32, 3))
    lat = posterior_mode(encoder_apply(vae_params2["encoder"], vae_cfg2, x))
    assert lat.shape[-1] == 16


def test_torch_saved_checkpoint_loads(tmp_path, tiny_dit):
    """A checkpoint written by safetensors.torch (the reference's writer,
    bf16 tensors) must load through our numpy reader."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file as torch_save

    cfg, params = tiny_dit
    state = export_transformer_state(params, cfg)
    tstate = {
        "model.diffusion_model." + k: torch.from_numpy(np.ascontiguousarray(v)).to(torch.bfloat16)
        for k, v in state.items()
    }
    path = str(tmp_path / "torch_ckpt.safetensors")
    torch_save(tstate, path, metadata={"config": json.dumps({"transformer": cfg.to_dict()})})

    from avatar_tpu.utils.weight_import import load_single_file_checkpoint

    configs, t_state, _ = load_single_file_checkpoint(path)
    cfg2 = DiTConfig.from_dict(configs["transformer"])
    params2 = import_transformer_state(t_state, cfg2)
    leaf = params2["patchify_proj"]["kernel"]
    assert leaf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(leaf, dtype=np.float32),
        np.asarray(params["patchify_proj"]["kernel"]).astype(np.float32),
        atol=0.01,  # bf16 quantization of the stored values
    )


# ---------------------------------------------------------------------------
# Real-checkpoint key manifests (VERDICT round-1 item 5): the complete torch
# key set of the shipped 2B transformer / LTX VAE, hand-enumerated from the
# reference module trees (transformer3d.py:52-128, attention.py:38-321,
# causal_video_autoencoder.py:122-177) — independent of our exporter.
# ---------------------------------------------------------------------------


def _real_transformer_key_manifest(num_layers=28):
    keys = {
        "patchify_proj.weight", "patchify_proj.bias",
        "adaln_single.emb.timestep_embedder.linear_1.weight",
        "adaln_single.emb.timestep_embedder.linear_1.bias",
        "adaln_single.emb.timestep_embedder.linear_2.weight",
        "adaln_single.emb.timestep_embedder.linear_2.bias",
        "adaln_single.linear.weight", "adaln_single.linear.bias",
        "caption_projection.linear_1.weight",
        "caption_projection.linear_1.bias",
        "caption_projection.linear_2.weight",
        "caption_projection.linear_2.bias",
        "scale_shift_table",
        "proj_out.weight", "proj_out.bias",
    }
    for i in range(num_layers):
        pre = f"transformer_blocks.{i}"
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                keys |= {f"{pre}.{attn}.{proj}.weight",
                         f"{pre}.{attn}.{proj}.bias"}
            keys |= {f"{pre}.{attn}.to_out.0.weight",
                     f"{pre}.{attn}.to_out.0.bias"}
            # qk_norm = rms_norm in the 2B config -> weight only
            keys |= {f"{pre}.{attn}.q_norm.weight",
                     f"{pre}.{attn}.k_norm.weight"}
        keys |= {
            f"{pre}.ff.net.0.proj.weight", f"{pre}.ff.net.0.proj.bias",
            f"{pre}.ff.net.2.weight", f"{pre}.ff.net.2.bias",
            f"{pre}.scale_shift_table",
        }
        # norm1/norm2: norm_elementwise_affine=False -> no parameters
    return keys


def _real_vae_key_manifest(timestep_conditioning=False):
    """Key set for the shipped LTX VAE block grammar
    (LTX_VAE_CONFIG / OURS_VAE_CONFIG in diffusers_config_mapping.py:106-130):
    pixel_norm (no norm params), uniform log-var, CausalConv3d everywhere."""
    blocks = [
        ("res_x", 4), ("compress_all", 1), ("res_x_y", 1), ("res_x", 3),
        ("compress_all", 1), ("res_x_y", 1), ("res_x", 3),
        ("compress_all", 1), ("res_x", 3), ("res_x", 4),
    ]
    keys = set()

    def causal_conv(prefix):
        return {f"{prefix}.conv.weight", f"{prefix}.conv.bias"}

    def resnet(prefix, in_out_differ, tconf):
        k = causal_conv(f"{prefix}.conv1") | causal_conv(f"{prefix}.conv2")
        if in_out_differ:  # make_linear_nd shortcut + LayerNormNd norm3
            k |= {f"{prefix}.conv_shortcut.weight",
                  f"{prefix}.conv_shortcut.bias",
                  f"{prefix}.norm3.norm.weight", f"{prefix}.norm3.norm.bias"}
        if tconf:
            k.add(f"{prefix}.scale_shift_table")
        return k

    # encoder: channels double on compress_all; res_x keeps, res_x_y scales
    # by the multiplier (1 here -> in==out for all res blocks except via
    # explicit channel steps — in the shipped config every res block is
    # channel-preserving, conv_shortcut never appears in the encoder
    # res_x/res_x_y blocks; the decoder mirrors this).
    # res_x_y entries: the int is num_layers, so the channel multiplier
    # keeps its default of 2 (causal_video_autoencoder.py:391-392) -> every
    # res_x_y block changes channels and carries conv_shortcut + norm3.
    # Decoder res_x_y blocks are built with timestep_conditioning=False even
    # when the decoder is conditioned (causal_video_autoencoder.py:656-668);
    # only the res_x (UNetMidBlock3D) resnets get scale_shift_table.
    keys |= causal_conv("encoder.conv_in")
    for i, (name, n) in enumerate(blocks):
        pre = f"encoder.down_blocks.{i}"
        if name == "res_x":
            for j in range(n):
                keys |= resnet(f"{pre}.res_blocks.{j}", False, False)
        elif name == "res_x_y":
            keys |= resnet(pre, True, False)
        elif name == "compress_all":
            keys |= causal_conv(pre)
    keys |= causal_conv("encoder.conv_out")

    keys |= causal_conv("decoder.conv_in")
    for i, (name, n) in enumerate(reversed(blocks)):
        pre = f"decoder.up_blocks.{i}"
        if name == "res_x":
            for j in range(n):
                keys |= resnet(f"{pre}.res_blocks.{j}", False,
                               timestep_conditioning)
            if timestep_conditioning:
                # each UNetMidBlock3D carries its own time embedder
                # (causal_video_autoencoder.py:849-851)
                keys |= {
                    f"{pre}.time_embedder.timestep_embedder.linear_1.weight",
                    f"{pre}.time_embedder.timestep_embedder.linear_1.bias",
                    f"{pre}.time_embedder.timestep_embedder.linear_2.weight",
                    f"{pre}.time_embedder.timestep_embedder.linear_2.bias",
                }
        elif name == "res_x_y":
            keys |= resnet(pre, True, False)
        elif name == "compress_all":
            keys |= causal_conv(f"{pre}.conv")  # DepthToSpaceUpsample.conv
    keys |= causal_conv("decoder.conv_out")
    if timestep_conditioning:
        keys |= {
            "decoder.timestep_scale_multiplier",
            "decoder.last_time_embedder.timestep_embedder.linear_1.weight",
            "decoder.last_time_embedder.timestep_embedder.linear_1.bias",
            "decoder.last_time_embedder.timestep_embedder.linear_2.weight",
            "decoder.last_time_embedder.timestep_embedder.linear_2.bias",
            "decoder.last_scale_shift_table",
        }
    keys |= {"per_channel_statistics.std-of-means",
             "per_channel_statistics.mean-of-means"}
    return keys


def test_transformer_import_consumes_real_2b_key_manifest():
    """Full 28-layer key set (reduced dims, identical key names): our export
    must produce exactly the manifest, and strict import must consume every
    key and reject leftovers."""
    cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=8, in_channels=16,
        out_channels=16, num_layers=28, cross_attention_dim=32,
        caption_channels=64, attention_bias=True, qk_norm="rms_norm",
        norm_elementwise_affine=False,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    state = export_transformer_state(params, cfg)
    manifest = _real_transformer_key_manifest(28)
    assert set(state) == manifest, (
        sorted(manifest - set(state))[:5], sorted(set(state) - manifest)[:5]
    )

    imported = import_transformer_state(state, cfg, strict=True)
    assert len(imported["blocks"]) == 28

    state_extra = dict(state)
    state_extra["transformer_blocks.0.attn1.stray.weight"] = np.zeros((2, 2))
    with pytest.raises(ValueError, match="Unconsumed"):
        import_transformer_state(state_extra, cfg, strict=True)


@pytest.mark.parametrize("tconf", [False, True])
def test_vae_import_consumes_real_ltx_key_manifest(tconf):
    """The shipped LTX VAE block grammar (10 blocks, pixel_norm, causal
    convs, per-channel statistics, optional timestep-conditioned decoder):
    export == hand manifest, strict import consumes everything."""
    import dataclasses

    from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig

    cfg = VAEConfig.from_dict(
        {**LTX_VAE_CONFIG, "timestep_conditioning": tconf}
    )
    # reduce width only (dims/keys identical to the real checkpoint)
    cfg = dataclasses.replace(
        cfg, base_channels=8, decoder_base_channels=8, latent_channels=4
    )
    params = init_vae(jax.random.PRNGKey(0), cfg)
    # the real checkpoint carries per-channel statistics buffers
    params["per_channel_statistics"] = {
        "std_of_means": np.ones((4,), np.float32),
        "mean_of_means": np.zeros((4,), np.float32),
    }
    state = export_vae_state(params, cfg)
    manifest = _real_vae_key_manifest(timestep_conditioning=tconf)
    assert set(state) == manifest, (
        sorted(manifest - set(state))[:8], sorted(set(state) - manifest)[:8]
    )

    imported = import_vae_state(state, cfg, strict=True)
    assert "per_channel_statistics" in imported

    state_extra = dict(state)
    state_extra["decoder.stray"] = np.zeros((2,))
    with pytest.raises(ValueError, match="Unconsumed"):
        import_vae_state(state_extra, cfg, strict=True)


# ---------------------------------------------------------------------------
# Export -> reference-remap -> torch strict load (VERDICT round-3 item 5):
# replay our single-file exports through a torch-side loader that applies the
# reference's own load logic (transformer3d.py:286-292,337-352;
# causal_video_autoencoder.py:103-120,248-296), then load_state_dict(
# strict=True) into a skeleton whose key set AND shapes are derived
# independently from the reference module constructors — proving a reference
# user can load our checkpoints with nothing silently dropped.
# ---------------------------------------------------------------------------


def _torch_skeleton(shapes):
    """Nested torch module tree with a zero Parameter per dotted key, so
    load_state_dict(strict=True) enforces exact key + shape agreement."""
    torch = pytest.importorskip("torch")
    root = torch.nn.Module()
    for key, shape in shapes.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if p not in mod._modules:
                mod.add_module(p, torch.nn.Module())
            mod = mod._modules[p]
        mod.register_parameter(
            parts[-1], torch.nn.Parameter(torch.zeros(shape))
        )
    return root


def _ref_transformer_shapes(heads, head_dim, in_ch, out_ch, layers, cross,
                            caption, ff_mult=4):
    """Shape manifest straight from the reference constructors
    (transformer3d.py:95-175, attention.py:425-437 RMSNorm(dim_head*heads),
    diffusers AdaLayerNormSingle / PixArtAlphaTextProjection / GELU FF)."""
    d = heads * head_dim
    shapes = {
        "patchify_proj.weight": (d, in_ch), "patchify_proj.bias": (d,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (d, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (d,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (d, d),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (d,),
        # adaptive_norm 'single_scale_shift' keeps the default 6x linear
        "adaln_single.linear.weight": (6 * d, d),
        "adaln_single.linear.bias": (6 * d,),
        "caption_projection.linear_1.weight": (d, caption),
        "caption_projection.linear_1.bias": (d,),
        "caption_projection.linear_2.weight": (d, d),
        "caption_projection.linear_2.bias": (d,),
        "scale_shift_table": (2, d),
        "proj_out.weight": (out_ch, d), "proj_out.bias": (out_ch,),
    }
    for i in range(layers):
        pre = f"transformer_blocks.{i}"
        for attn, kv in (("attn1", d), ("attn2", cross)):
            shapes[f"{pre}.{attn}.to_q.weight"] = (d, d)
            shapes[f"{pre}.{attn}.to_q.bias"] = (d,)
            for p in ("to_k", "to_v"):
                shapes[f"{pre}.{attn}.{p}.weight"] = (d, kv)
                shapes[f"{pre}.{attn}.{p}.bias"] = (d,)
            shapes[f"{pre}.{attn}.to_out.0.weight"] = (d, d)
            shapes[f"{pre}.{attn}.to_out.0.bias"] = (d,)
            # qk_norm rms_norm: RMSNorm(dim_head * heads) — over inner_dim
            shapes[f"{pre}.{attn}.q_norm.weight"] = (d,)
            shapes[f"{pre}.{attn}.k_norm.weight"] = (d,)
        shapes[f"{pre}.ff.net.0.proj.weight"] = (ff_mult * d, d)
        shapes[f"{pre}.ff.net.0.proj.bias"] = (ff_mult * d,)
        shapes[f"{pre}.ff.net.2.weight"] = (d, ff_mult * d)
        shapes[f"{pre}.ff.net.2.bias"] = (d,)
        shapes[f"{pre}.scale_shift_table"] = (6, d)
    return shapes


def _ref_vae_shapes(base, latent, patch, tconf):
    """Shape manifest from the reference Encoder/Decoder channel math
    (causal_video_autoencoder.py:341-520 encoder: compress_all preserves
    channels, res_x_y doubles; :584-731 decoder: conv_in at base*prod(
    multipliers), res_x_y halves, DepthToSpaceUpsample conv at
    prod(stride)*C; ResnetBlock3D :1091-1179; pixel_norm => no norm params)
    for the shipped LTX block grammar."""
    blocks = [("res_x", 4), ("compress_all", 1), ("res_x_y", 1),
              ("res_x", 3), ("compress_all", 1), ("res_x_y", 1),
              ("res_x", 3), ("compress_all", 1), ("res_x", 3), ("res_x", 4)]
    shapes = {}

    def conv(prefix, out_c, in_c, k=3):
        shapes[f"{prefix}.conv.weight"] = (out_c, in_c, k, k, k)
        shapes[f"{prefix}.conv.bias"] = (out_c,)

    def resnet(prefix, in_c, out_c, t):
        conv(f"{prefix}.conv1", out_c, in_c)
        conv(f"{prefix}.conv2", out_c, out_c)
        if in_c != out_c:  # make_linear_nd shortcut + LayerNorm(in) norm3
            shapes[f"{prefix}.conv_shortcut.weight"] = (out_c, in_c, 1, 1, 1)
            shapes[f"{prefix}.conv_shortcut.bias"] = (out_c,)
            shapes[f"{prefix}.norm3.norm.weight"] = (in_c,)
            shapes[f"{prefix}.norm3.norm.bias"] = (in_c,)
        if t:  # timestep-conditioned resnet (:1176-1179)
            shapes[f"{prefix}.scale_shift_table"] = (4, in_c)

    def embedder(prefix, dim):
        shapes[f"{prefix}.timestep_embedder.linear_1.weight"] = (dim, 256)
        shapes[f"{prefix}.timestep_embedder.linear_1.bias"] = (dim,)
        shapes[f"{prefix}.timestep_embedder.linear_2.weight"] = (dim, dim)
        shapes[f"{prefix}.timestep_embedder.linear_2.bias"] = (dim,)

    # --- encoder (:362-507): conv_in sees patchified pixels
    conv("encoder.conv_in", base, 3 * patch * patch)
    c = base
    for i, (name, n) in enumerate(blocks):
        pre = f"encoder.down_blocks.{i}"
        if name == "res_x":
            for j in range(n):
                resnet(f"{pre}.res_blocks.{j}", c, c, False)
        elif name == "res_x_y":
            resnet(pre, c, 2 * c, False)
            c *= 2
        else:  # compress_all: strided causal conv, channel-preserving
            conv(pre, c, c)
    conv("encoder.conv_out", latent + 1, c)  # uniform log-var (+1 channel)

    # --- decoder (:607-731): built over reversed(blocks)
    c = base * 4  # product of the two res_x_y multipliers
    conv("decoder.conv_in", c, latent)
    for i, (name, n) in enumerate(reversed(blocks)):
        pre = f"decoder.up_blocks.{i}"
        if name == "res_x":
            for j in range(n):
                resnet(f"{pre}.res_blocks.{j}", c, c, tconf)
            if tconf:  # per-mid-block embedder at 4*C (:849-852)
                embedder(f"{pre}.time_embedder", 4 * c)
        elif name == "res_x_y":
            resnet(pre, c, c // 2, False)  # never t-conditioned (:660-668)
            c //= 2
        else:  # compress_all -> DepthToSpaceUpsample (:1021-1045)
            conv(f"{pre}.conv", 8 * c, c)
    conv("decoder.conv_out", 3 * patch * patch, c)
    if tconf:
        shapes["decoder.timestep_scale_multiplier"] = ()
        embedder("decoder.last_time_embedder", 2 * c)  # :726-728
        shapes["decoder.last_scale_shift_table"] = (2, c)
    return shapes


@pytest.fixture(scope="module")
def exported_single_file(tmp_path_factory):
    """One reference-format single-file checkpoint: full 28-layer DiT key
    cardinality + the full LTX VAE block grammar (reduced widths only)."""
    import dataclasses

    from avatar_tpu.models.vae import LTX_VAE_CONFIG, VAEConfig, init_vae

    dit_cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=8, in_channels=16,
        out_channels=16, num_layers=28, cross_attention_dim=24,
        caption_channels=40, attention_bias=True, qk_norm="rms_norm",
        norm_elementwise_affine=False,
    )
    dit_params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    vae_cfg = dataclasses.replace(
        VAEConfig.from_dict(
            {**LTX_VAE_CONFIG, "timestep_conditioning": True}
        ),
        base_channels=8, decoder_base_channels=8, latent_channels=4,
    )
    vae_params = init_vae(jax.random.PRNGKey(1), vae_cfg)
    vae_params["per_channel_statistics"] = {
        "std_of_means": np.ones((4,), np.float32),
        "mean_of_means": np.zeros((4,), np.float32),
    }
    path = tmp_path_factory.mktemp("export") / "merged.safetensors"
    save_single_file_checkpoint(
        path, dit_params, dit_cfg,
        vae_state=export_vae_state(vae_params, vae_cfg),
        vae_config=vae_cfg.to_dict(),
    )
    return path, dit_cfg, vae_cfg


def test_export_loads_via_reference_transformer_logic(exported_single_file):
    """transformer3d.py:337-352 single-file path + :286-292 prefix strip,
    then strict torch load into the independently-derived skeleton."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import load_file

    path, dit_cfg, _ = exported_single_file
    state = load_file(str(path))

    # reference Transformer3DModel.load_state_dict (:286-292): keep only the
    # model.diffusion_model.* keys, stripped
    assert any(k.startswith("model.diffusion_model.") for k in state)
    state = {
        k.replace("model.diffusion_model.", ""): v
        for k, v in state.items()
        if k.startswith("model.diffusion_model.")
    }

    skeleton = _torch_skeleton(_ref_transformer_shapes(
        heads=4, head_dim=8, in_ch=16, out_ch=16, layers=28, cross=24,
        caption=40,
    ))
    # strict=True: every key must land with the exact reference shape
    skeleton.load_state_dict(state, strict=True)
    got = skeleton.state_dict()
    assert len(got) == len(state)
    assert got["transformer_blocks.27.ff.net.0.proj.weight"].shape == (128, 32)


def test_export_loads_via_reference_vae_logic(exported_single_file):
    """causal_video_autoencoder.py:103-120 single-file path + :248-296
    load_state_dict (vae.* filter, key_mapping, norm-drop, per-channel
    statistics buffer split), then strict torch load."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import load_file

    path, _, vae_cfg = exported_single_file
    state = load_file(str(path))

    # reference load_state_dict (:249-254): any vae.* key present => keep
    # ONLY vae.* keys, stripped. This is why our exporter must prefix the
    # per-channel statistics too — bare keys would be dropped here.
    assert any(k.startswith("vae.") for k in state)
    state = {
        k.replace("vae.", "", 1): v
        for k, v in state.items()
        if k.startswith("vae.")
    }

    # buffer split (:255-259, :285-296)
    stats = {
        k.removeprefix("per_channel_statistics."): v
        for k, v in state.items()
        if k.startswith("per_channel_statistics.")
    }
    assert stats["std-of-means"].shape == (4,)
    assert stats["mean-of-means"].shape == (4,)
    ckpt = {
        k: v for k, v in state.items()
        if not k.startswith("per_channel_statistics.")
    }

    skeleton = _torch_skeleton(_ref_vae_shapes(
        base=8, latent=4, patch=4, tconf=True,
    ))
    # key_mapping + norm-drop replay (:261-281)
    model_keys = set(name for name, _ in skeleton.named_modules())
    key_mapping = {".resnets.": ".res_blocks.", "downsamplers.0": "downsample",
                   "upsamplers.0": "upsample"}
    converted = {}
    for key, value in ckpt.items():
        for k, v in key_mapping.items():
            key = key.replace(k, v)
        key_prefix = ".".join(key.split(".")[:-1])
        if "norm" in key and key_prefix not in model_keys:
            continue  # dropped by the reference loader
        converted[key] = value
    # nothing of ours may be silently dropped by the norm filter
    assert set(converted) == set(ckpt)

    skeleton.load_state_dict(converted, strict=True)
    assert skeleton.state_dict()[
        "decoder.up_blocks.2.conv.conv.weight"
    ].shape == (256, 32, 3, 3, 3)


def test_diffusers_rename_tables():
    """Every rename rule in both tables produces the reference key the
    single-file importer expects (diffusers_config_mapping.py:140-174)."""
    from avatar_tpu.utils.weight_import import normalize_diffusers_state

    t_pairs = {
        "proj_in.weight": "patchify_proj.weight",
        "time_embed.emb.timestep_embedder.linear_1.weight":
            "adaln_single.emb.timestep_embedder.linear_1.weight",
        "transformer_blocks.3.attn1.norm_q.weight":
            "transformer_blocks.3.attn1.q_norm.weight",
        "transformer_blocks.3.attn1.norm_k.weight":
            "transformer_blocks.3.attn1.k_norm.weight",
    }
    got = normalize_diffusers_state(
        {k: np.zeros(()) for k in t_pairs}, "transformer"
    )
    assert set(got) == set(t_pairs.values())

    v_pairs = {
        # every VAE table rule exercised at least once
        "decoder.up_blocks.3.conv_in.conv.weight": "decoder.up_blocks.7.conv.weight",
        "decoder.up_blocks.3.upsamplers.0.conv.weight": "decoder.up_blocks.8.conv.weight",
        "decoder.up_blocks.3.resnets.1.conv1.conv.weight": "decoder.up_blocks.9.res_blocks.1.conv1.conv.weight",
        "decoder.up_blocks.2.upsamplers.0.conv.weight": "decoder.up_blocks.5.conv.weight",
        "decoder.up_blocks.2.conv_in.conv.weight": "decoder.up_blocks.4.conv.weight",
        "decoder.up_blocks.2.resnets.0.conv2.conv.bias": "decoder.up_blocks.6.res_blocks.0.conv2.conv.bias",
        "decoder.up_blocks.1.upsamplers.0.conv.weight": "decoder.up_blocks.2.conv.weight",
        "decoder.up_blocks.1.resnets.0.norm3.weight": "decoder.up_blocks.3.res_blocks.0.norm3.norm.weight",
        "decoder.up_blocks.0.resnets.0.conv1.conv.weight": "decoder.up_blocks.1.res_blocks.0.conv1.conv.weight",
        "decoder.mid_block.resnets.0.conv1.conv.weight": "decoder.up_blocks.0.res_blocks.0.conv1.conv.weight",
        "encoder.down_blocks.3.resnets.0.conv1.conv.weight": "encoder.down_blocks.8.res_blocks.0.conv1.conv.weight",
        "encoder.down_blocks.2.downsamplers.0.conv.weight": "encoder.down_blocks.7.conv.weight",
        "encoder.down_blocks.2.resnets.0.conv1.conv.weight": "encoder.down_blocks.6.res_blocks.0.conv1.conv.weight",
        "encoder.down_blocks.1.downsamplers.0.conv.weight": "encoder.down_blocks.4.conv.weight",
        "encoder.down_blocks.1.conv_out.conv.weight": "encoder.down_blocks.5.conv.weight",
        "encoder.down_blocks.1.resnets.0.conv1.conv.weight": "encoder.down_blocks.3.res_blocks.0.conv1.conv.weight",
        "encoder.down_blocks.0.conv_out.conv.weight": "encoder.down_blocks.2.conv.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight": "encoder.down_blocks.1.conv.weight",
        "encoder.down_blocks.0.resnets.0.conv1.conv.weight": "encoder.down_blocks.0.res_blocks.0.conv1.conv.weight",
        "encoder.mid_block.resnets.0.conv1.conv.weight": "encoder.down_blocks.9.res_blocks.0.conv1.conv.weight",
        "some.block.conv_shortcut.conv.weight": "some.block.conv_shortcut.weight",
        "latents_mean": "per_channel_statistics.mean-of-means",
        "latents_std": "per_channel_statistics.std-of-means",
    }
    got = normalize_diffusers_state(
        {k: np.zeros(()) for k in v_pairs}, "vae"
    )
    assert set(got) == set(v_pairs.values()), (
        sorted(set(got) ^ set(v_pairs.values()))[:6]
    )
