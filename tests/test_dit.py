"""DiT denoiser tests: shape contracts, per-token timesteps, STG skip masks,
avatar ref/pose conditioning lerp, LoRA delta path, jit consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.models.dit import (
    DiTConfig,
    SkipLayerStrategy,
    avatar_condition_tokens,
    create_skip_layer_mask,
    dit_apply,
    init_dit,
)
from avatar_tpu.ops.rope import get_latent_coords


@pytest.fixture(scope="module")
def tiny():
    cfg = DiTConfig(
        num_attention_heads=4,
        attention_head_dim=16,
        in_channels=16,
        out_channels=16,
        num_layers=2,
        cross_attention_dim=64,
        caption_channels=96,
        positional_embedding_max_pos=(20, 2048, 2048),
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=2, f=3, h=4, w=5, text_len=8, key=7):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    n = f * h * w
    tokens = jax.random.normal(ks[0], (b, n, cfg.in_channels))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(ks[1], (b, text_len, cfg.caption_channels))
    mask = jnp.ones((b, text_len))
    return tokens, grid, text, mask


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.9])
    out = dit_apply(params, cfg, tokens, grid, t, text, mask, attention_impl="xla")
    assert out.shape == tokens.shape
    assert not np.isnan(np.asarray(out)).any()


def test_per_token_timestep(tiny):
    """[B, N] per-token timesteps produce per-token modulation; a token's
    output must differ when only its timestep changes."""
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    n = tokens.shape[1]
    t_a = jnp.full((2, n), 0.5)
    t_b = t_a.at[:, 0].set(0.0)
    out_a = dit_apply(params, cfg, tokens, grid, t_a, text, mask, attention_impl="xla")
    out_b = dit_apply(params, cfg, tokens, grid, t_b, text, mask, attention_impl="xla")
    assert not np.allclose(np.asarray(out_a[:, 0]), np.asarray(out_b[:, 0]))


def test_text_mask_effect(tiny):
    """Masked-out text tokens must not affect the output."""
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.5])
    mask_half = mask.at[:, 4:].set(0.0)
    out_a = dit_apply(params, cfg, tokens, grid, t, text, mask_half, attention_impl="xla")
    text_perturbed = text.at[:, 4:].set(123.0)
    out_b = dit_apply(
        params, cfg, tokens, grid, t, text_perturbed, mask_half, attention_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


@pytest.mark.parametrize(
    "strategy",
    [
        SkipLayerStrategy.AttentionSkip,
        SkipLayerStrategy.AttentionValues,
        SkipLayerStrategy.TransformerBlock,
    ],
)
def test_skip_layer_mask(tiny, strategy):
    """STG: a zeroed skip mask entry changes only that batch element."""
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.5])
    slm = create_skip_layer_mask(cfg.num_layers, 1, 2, ptb_index=1, skip_block_list=[1])
    assert slm.shape == (2, 2)
    out_skip = dit_apply(
        params, cfg, tokens, grid, t, text, mask,
        skip_layer_mask=slm, skip_layer_strategy=strategy, attention_impl="xla",
    )
    out_full = dit_apply(params, cfg, tokens, grid, t, text, mask, attention_impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_skip[0]), np.asarray(out_full[0]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out_skip[1]), np.asarray(out_full[1]))


def test_avatar_condition_tokens():
    """Reference/pose lerp (transformer3d.py:447-466): frame 0 pulled 0.85
    toward the ref image, frames 1+ pulled 0.5 toward pose latents."""
    b, f, h, w, c = 2, 3, 2, 2, 4
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((b, f * h * w, c)).astype(np.float32)
    ref = rng.standard_normal((b, 1, h, w, c)).astype(np.float32)
    pose = rng.standard_normal((b, f, h, w, c)).astype(np.float32)
    out = avatar_condition_tokens(
        jnp.asarray(tokens), jnp.asarray(ref), jnp.asarray(pose)
    )
    x = tokens.reshape(b, f, h, w, c)
    expected = x.copy()
    expected[:, :1] = x[:, :1] + 0.85 * (ref - x[:, :1])
    expected[:, 1:] = x[:, 1:] + 0.5 * (pose[:, 1:] - x[:, 1:])
    np.testing.assert_allclose(
        np.asarray(out), expected.reshape(b, -1, c), atol=1e-6
    )


def test_lora_delta(tiny):
    """Zero-B LoRA is a no-op; nonzero B changes only through attn2 path."""
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.5])
    rank = 4
    key = jax.random.PRNGKey(9)

    def make_lora(b_scale):
        lora_blocks = []
        for _ in range(cfg.num_layers):
            ks = jax.random.split(key, 4)
            lora_blocks.append(
                {
                    "attn2": {
                        name: {
                            "a": jax.random.normal(ks[i], (dim_in, rank)) * 0.1,
                            "b": jnp.full((rank, dim_out), b_scale),
                        }
                        for i, (name, dim_in, dim_out) in enumerate(
                            [
                                ("to_q", cfg.inner_dim, cfg.inner_dim),
                                ("to_k", cfg.cross_attention_dim, cfg.inner_dim),
                                ("to_v", cfg.cross_attention_dim, cfg.inner_dim),
                                ("to_out", cfg.inner_dim, cfg.inner_dim),
                            ]
                        )
                    }
                }
            )
        return {"blocks": lora_blocks}

    base = dit_apply(params, cfg, tokens, grid, t, text, mask, attention_impl="xla")
    zero = dit_apply(
        params, cfg, tokens, grid, t, text, mask,
        lora=make_lora(0.0), attention_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(zero), atol=1e-6)
    nonzero = dit_apply(
        params, cfg, tokens, grid, t, text, mask,
        lora=make_lora(0.05), attention_impl="xla",
    )
    assert not np.allclose(np.asarray(base), np.asarray(nonzero))


def test_jit_and_remat_consistency(tiny):
    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.5])
    eager = dit_apply(params, cfg, tokens, grid, t, text, mask, attention_impl="xla")
    jitted = jax.jit(
        lambda p, x: dit_apply(p, cfg, x, grid, t, text, mask, attention_impl="xla")
    )(params, tokens)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)
    remat = dit_apply(
        params, cfg, tokens, grid, t, text, mask, attention_impl="xla", remat=True
    )
    np.testing.assert_allclose(np.asarray(eager), np.asarray(remat), atol=1e-6)


def test_split_rope_and_cross_kv_match_baseline(tiny):
    """The inference-optimized paths (split-RoPE permuted params, precomputed
    cross-attention k/v) are numerically equivalent to the reference layout."""
    from avatar_tpu.models.dit import (
        permute_dit_params_for_split_rope,
        precompute_cross_attention_kv,
    )
    from avatar_tpu.ops.rope import precompute_freqs_cis, split_freqs

    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.9])

    base = dit_apply(params, cfg, tokens, grid, t, text, mask,
                     attention_impl="xla")

    # split-RoPE with permuted params
    p_split = permute_dit_params_for_split_rope(params, cfg)
    out_split = dit_apply(p_split, cfg, tokens, grid, t, text, mask,
                          attention_impl="xla", rope_split=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_split),
                               atol=2e-5)

    # precomputed cross-attention k/v (on top of split-RoPE)
    cross_kv, _ = precompute_cross_attention_kv(params, cfg, text)
    out_kv = dit_apply(p_split, cfg, tokens, grid, t, None, mask,
                       attention_impl="xla", rope_split=True,
                       cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_kv),
                               atol=2e-5)

    # explicit split freqs precompute (the pipeline path)
    freqs = split_freqs(precompute_freqs_cis(
        grid, dim=cfg.inner_dim, theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos,
    ))
    out_pre = dit_apply(p_split, cfg, tokens, grid, t, None, mask,
                        attention_impl="xla", rope_split=True,
                        cross_kv=cross_kv, freqs_cis=freqs)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_pre),
                               atol=2e-5)


def test_split_rope_equivalence_op_level():
    """apply_rotary_emb_split on permuted channels == permuted
    apply_rotary_emb (the conjugation identity used for the kernel trick)."""
    from avatar_tpu.ops.rope import (
        apply_rotary_emb,
        apply_rotary_emb_split,
        precompute_freqs_cis,
        rope_channel_permutation,
        split_freqs,
    )

    dim = 96  # dim % 6 == 0
    grid = get_latent_coords(2, 3, 4, batch_size=1)
    freqs = precompute_freqs_cis(grid, dim=dim)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 24, dim))
    perm = rope_channel_permutation(dim)
    out_ref = apply_rotary_emb(x, freqs)
    out_split = apply_rotary_emb_split(x[..., perm], split_freqs(freqs))
    np.testing.assert_allclose(
        np.asarray(out_ref[..., perm]), np.asarray(out_split), atol=1e-6
    )

    # dim % 6 != 0 exercises the identity-pair padding (dim=2048-style)
    dim = 100  # pad = 100 % 6 = 4 -> 2 identity pairs
    freqs = precompute_freqs_cis(grid, dim=dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, dim))
    perm = rope_channel_permutation(dim)
    out_ref = apply_rotary_emb(x, freqs)
    out_split = apply_rotary_emb_split(x[..., perm], split_freqs(freqs))
    np.testing.assert_allclose(
        np.asarray(out_ref[..., perm]), np.asarray(out_split), atol=1e-6
    )


def test_scan_blocks_matches_unrolled(tiny):
    """Stacked-blocks lax.scan path (LTXVideoPipeline(scan_blocks=True):
    depth-independent compile) bit-matches the python-unrolled loop across
    plain / skip-mask / cross_kv+split-rope / lora variants."""
    from avatar_tpu.models.dit import (
        permute_dit_params_for_split_rope,
        precompute_cross_attention_kv,
    )
    from avatar_tpu.parallel.pipeline import stack_block_params

    cfg, params = tiny
    tokens, grid, text, mask = _inputs(cfg)
    t = jnp.asarray([0.5, 0.9])
    stacked = dict(params, blocks=stack_block_params(params["blocks"]))

    base = dit_apply(params, cfg, tokens, grid, t, text, mask,
                     attention_impl="xla")
    out = dit_apply(stacked, cfg, tokens, grid, t, text, mask,
                    attention_impl="xla")
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=2e-5)

    # STG skip mask rows scan alongside the layer axis
    slm = create_skip_layer_mask(cfg.num_layers, 1, 2, ptb_index=1,
                                 skip_block_list=[1])
    base_s = dit_apply(params, cfg, tokens, grid, t, text, mask,
                       skip_layer_mask=slm,
                       skip_layer_strategy=SkipLayerStrategy.AttentionSkip,
                       attention_impl="xla")
    out_s = dit_apply(stacked, cfg, tokens, grid, t, text, mask,
                      skip_layer_mask=slm,
                      skip_layer_strategy=SkipLayerStrategy.AttentionSkip,
                      attention_impl="xla")
    np.testing.assert_allclose(np.asarray(base_s), np.asarray(out_s),
                               atol=2e-5)

    # split-RoPE params + stacked cross_kv (the serving pipeline layout:
    # precompute_cross_attention_kv returns the stacked pair directly)
    p_split = permute_dit_params_for_split_rope(params, cfg)
    st_split = dict(p_split, blocks=stack_block_params(p_split["blocks"]))
    kv_st, _ = precompute_cross_attention_kv(st_split, cfg, text)
    assert isinstance(kv_st, tuple) and kv_st[0].shape[0] == cfg.num_layers
    out_kv = dit_apply(st_split, cfg, tokens, grid, t, None, mask,
                       attention_impl="xla", rope_split=True, cross_kv=kv_st)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_kv),
                               atol=2e-5)

    # lora (list-of-blocks form is stacked in-trace)
    rank = 4
    lora_blocks = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(jax.random.PRNGKey(20 + li), 4)
        lora_blocks.append({
            "attn2": {
                name: {
                    "a": jax.random.normal(ks[i], (dim_in, rank)) * 0.1,
                    "b": jnp.full((rank, dim_out), 0.05),
                }
                for i, (name, dim_in, dim_out) in enumerate([
                    ("to_q", cfg.inner_dim, cfg.inner_dim),
                    ("to_k", cfg.cross_attention_dim, cfg.inner_dim),
                    ("to_v", cfg.cross_attention_dim, cfg.inner_dim),
                    ("to_out", cfg.inner_dim, cfg.inner_dim),
                ])
            }
        })
    lora = {"blocks": lora_blocks}
    base_l = dit_apply(params, cfg, tokens, grid, t, text, mask, lora=lora,
                       attention_impl="xla")
    out_l = dit_apply(stacked, cfg, tokens, grid, t, text, mask, lora=lora,
                      attention_impl="xla")
    np.testing.assert_allclose(np.asarray(base_l), np.asarray(out_l),
                               atol=2e-5)
