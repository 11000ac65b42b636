"""Ring (context-parallel) attention on the 8-virtual-device mesh.

Unlike Ulysses (tests/test_sequence_parallel.py), ring attention has no
heads % devices constraint — these tests deliberately use FEWER heads (4)
than devices (8), the regime Ulysses cannot shard, and check the
ppermute-rotation online softmax against dense attention, forward and
backward, masked and bounded.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from avatar_tpu.ops.attention import xla_attention
from avatar_tpu.parallel.sequence import ring_attention


@pytest.fixture(scope="module")
def sp_mesh():
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devices, axis_names=("sp",))


def _ring_fn(sp_mesh, **kw):
    return jax.jit(
        shard_map(
            partial(ring_attention, axis_name="sp", **kw),
            mesh=sp_mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None),
        )
    )


def test_ring_self_attention_matches(sp_mesh):
    b, h, n, d = 2, 4, 256, 16  # 4 heads < 8 shards: beyond Ulysses' reach
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))

    ref = xla_attention(q, k, v)
    out = _ring_fn(sp_mesh)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_bounded_matches(sp_mesh):
    """Max-free accumulation (the qk-normed inference path)."""
    b, h, n, d = 1, 4, 512, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))

    ref = xla_attention(q, k, v)
    out = _ring_fn(sp_mesh, bounded_logits=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bounded", [False, True])
def test_ring_with_kv_mask(sp_mesh, bounded):
    """The kv keep-mask shard rotates around the ring with its k/v chunk."""
    b, h, n, d = 1, 4, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    mask = (jax.random.uniform(ks[3], (b, n)) > 0.3).astype(jnp.float32)
    bias = jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)

    ref = xla_attention(q, k, v, bias)
    fn = jax.jit(
        shard_map(
            lambda q, k, v, m: ring_attention(
                q, k, v, axis_name="sp", kv_mask=m, bounded_logits=bounded
            ),
            mesh=sp_mesh,
            in_specs=(
                P(None, None, "sp", None), P(None, None, "sp", None),
                P(None, None, "sp", None), P(None, "sp"),
            ),
            out_specs=P(None, None, "sp", None),
        )
    )
    out = fn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bounded", [False, True])
def test_ring_fully_masked_rows_uniform(sp_mesh, bounded):
    """All-masked rows degrade to uniform attention like the dense oracle's
    -1e30 bias convention (no NaNs from the online-softmax rescale or the
    bounded branch's exp(-1e30)==0 denominator)."""
    b, h, n, d = 1, 4, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    mask = jnp.zeros((b, n))

    fn = jax.jit(
        shard_map(
            lambda q, k, v, m: ring_attention(
                q, k, v, axis_name="sp", kv_mask=m, bounded_logits=bounded
            ),
            mesh=sp_mesh,
            in_specs=(
                P(None, None, "sp", None), P(None, None, "sp", None),
                P(None, None, "sp", None), P(None, "sp"),
            ),
            out_specs=P(None, None, "sp", None),
        )
    )
    out = np.asarray(fn(q, k, v, mask))
    assert np.isfinite(out).all()
    uniform = np.asarray(jnp.mean(v, axis=2, keepdims=True))
    np.testing.assert_allclose(
        out, np.broadcast_to(uniform, out.shape), atol=2e-5
    )


@pytest.mark.parametrize("bounded", [False, True])
def test_ring_backward_matches(sp_mesh, bounded):
    """scan + ppermute transpose correctly: dq/dk/dv match dense attention."""
    b, h, n, d = 1, 4, 128, 8
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    cot = jax.random.normal(ks[3], (b, h, n, d))

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * cot)

    ring = _ring_fn(sp_mesh, bounded_logits=bounded)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) * cot)

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=3e-5)


@pytest.mark.parametrize("bounded", [False, True])
def test_ring_flash_matches_dense(sp_mesh, bounded):
    """Pallas flash kernels per chunk + lse merge == dense attention
    (interpret mode on CPU), forward and backward."""
    from avatar_tpu.parallel.sequence import ring_flash_attention

    b, h, n, d = 1, 4, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    cot = jax.random.normal(ks[3], (b, h, n, d))

    fn = jax.jit(
        shard_map(
            partial(ring_flash_attention, axis_name="sp",
                    bounded_logits=bounded),
            mesh=sp_mesh,
            in_specs=(P(None, None, "sp", None),) * 3,
            out_specs=P(None, None, "sp", None),
            check_vma=False,  # pallas_call has no vma rule
        )
    )
    ref = xla_attention(q, k, v)
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * cot)

    def loss_ring(q, k, v):
        return jnp.sum(fn(q, k, v) * cot)

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=3e-5)


def test_ring_flash_kv_mask(sp_mesh):
    """Masked kv positions drop out; fully-masked chunks (a whole device's
    shard masked) are excised from the lse merge without NaNs."""
    from avatar_tpu.parallel.sequence import ring_flash_attention

    b, h, n, d = 1, 4, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    # mask out the whole 2nd device shard (tokens 32..63) plus a scatter
    mask = (jax.random.uniform(ks[3], (b, n)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 32:64].set(0.0)
    bias = jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)

    fn = jax.jit(
        shard_map(
            lambda q, k, v, m: ring_flash_attention(
                q, k, v, axis_name="sp", kv_mask=m
            ),
            mesh=sp_mesh,
            in_specs=(
                P(None, None, "sp", None), P(None, None, "sp", None),
                P(None, None, "sp", None), P(None, "sp"),
            ),
            out_specs=P(None, None, "sp", None),
            check_vma=False,  # pallas_call has no vma rule
        )
    )
    ref = xla_attention(q, k, v, bias)
    out = fn(q, k, v, mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dit_apply_sp_ring_matches_unsharded(sp_mesh):
    """Full DiT with sp_impl='ring' and heads (4) NOT divisible by the sp
    axis (8) — the config Ulysses asserts on — matches unsharded dit_apply,
    forward and backward."""
    from avatar_tpu.models.dit import DiTConfig, dit_apply, init_dit
    from avatar_tpu.ops.rope import get_latent_coords
    from avatar_tpu.parallel.sequence import dit_apply_sp

    cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=16, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=96,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg)
    b, f, h, w = 2, 4, 4, 4
    tokens = jax.random.normal(jax.random.PRNGKey(1), (b, f * h * w, 16))
    grid = get_latent_coords(f, h, w, batch_size=b)
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 8, 96))
    mask = jnp.ones((b, 8))
    t = jnp.asarray([0.5, 0.9])
    target = jax.random.normal(jax.random.PRNGKey(3), tokens.shape)

    base = dit_apply(params, cfg, tokens, grid, t, text, mask,
                     attention_impl="xla")
    out = dit_apply_sp(params, cfg, tokens, grid, t, text, mask,
                       mesh=sp_mesh, attention_impl="xla", sp_impl="ring")
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5)

    # ulysses would refuse this head count outright
    with pytest.raises(AssertionError):
        dit_apply_sp(params, cfg, tokens, grid, t, text, mask,
                     mesh=sp_mesh, attention_impl="xla")

    def loss(p, fn):
        out = fn(p)
        return jnp.mean((out - target) ** 2)

    l0, g0 = jax.value_and_grad(
        lambda p: loss(p, lambda pp: dit_apply(
            pp, cfg, tokens, grid, t, text, mask, attention_impl="xla"))
    )(params)
    l1, g1 = jax.value_and_grad(
        lambda p: loss(p, lambda pp: dit_apply_sp(
            pp, cfg, tokens, grid, t, text, mask, mesh=sp_mesh,
            attention_impl="xla", sp_impl="ring"))
    )(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), bb in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_ring_sp_matches(sp_mesh):
    """Whole generation pipeline with sp_impl='ring' == unsharded output."""
    import dataclasses

    from avatar_tpu.diffusion import RectifiedFlowSchedule
    from avatar_tpu.models.dit import DiTConfig, init_dit
    from avatar_tpu.models.vae import demo_config, init_vae
    from avatar_tpu.pipelines import GenerationParams, LTXVideoPipeline

    vae_cfg = dataclasses.replace(
        demo_config(latent_channels=8), base_channels=32,
        decoder_base_channels=32,
    )
    dit_cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    vae_params = init_vae(jax.random.PRNGKey(0), vae_cfg)
    dit_params = init_dit(jax.random.PRNGKey(1), dit_cfg)
    sched = RectifiedFlowSchedule.create(
        sampler="Uniform", shifting="SD3", target_shift_terminal=0.1
    )

    def build(sp):
        return LTXVideoPipeline(
            dit_cfg, dit_params, vae_cfg, vae_params, schedule=sched,
            attention_impl="xla", sp_mesh=sp_mesh if sp else None,
            sp_impl="ring",
        )

    h = w = 64
    frames = 9
    params = GenerationParams(
        height=h, width=w, num_frames=frames, frame_rate=25.0,
        num_inference_steps=2, guidance_scale=1.0, stg_scale=0.0,
        rescaling_scale=1.0, decode_timestep=0.05,
    )
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    mask = jnp.ones((1, 8))
    ref = jax.random.normal(jax.random.PRNGKey(3), (1, 1, h, w, 3))
    pose = jax.random.normal(jax.random.PRNGKey(4), (1, frames, h, w, 3))

    out_base = build(False)(
        params, jax.random.PRNGKey(0), embeds, mask, ref_image=ref,
        pose_frames=pose, dtype=jnp.float32,
    )
    out_sp = build(True)(
        params, jax.random.PRNGKey(0), embeds, mask, ref_image=ref,
        pose_frames=pose, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_base), atol=3e-5
    )
