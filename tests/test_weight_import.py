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
from avatar_tpu.utils.safetensors_io import (
    load_config_metadata,
    load_safetensors,
    save_safetensors,
)
from avatar_tpu.utils.weight_import import (
    export_transformer_state,
    export_vae_state,
    import_transformer_state,
    import_vae_state,
    load_checkpoint,
    save_single_file_checkpoint,
)


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
