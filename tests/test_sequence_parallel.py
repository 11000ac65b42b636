"""Ulysses sequence-parallel attention on the 8-virtual-device mesh:
the token-sharded path must bit-match unsharded attention."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from avatar_tpu.ops.attention import xla_attention
from avatar_tpu.parallel.sequence import (
    ulysses_attention,
    ulysses_cross_attention,
)


@pytest.fixture(scope="module")
def sp_mesh():
    devices = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devices, axis_names=("sp",))


def test_ulysses_self_attention_matches(sp_mesh):
    b, h, n, d = 2, 8, 256, 16  # heads divisible by 8 shards
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))

    ref = xla_attention(q, k, v)

    fn = shard_map(
        partial(ulysses_attention, axis_name="sp", attention_impl="xla"),
        mesh=sp_mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_with_kv_mask(sp_mesh):
    b, h, n, d = 1, 8, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    mask = (jax.random.uniform(ks[3], (b, n)) > 0.3).astype(jnp.float32)
    bias = jnp.where(mask[:, None, None, :] > 0.5, 0.0, -1e30)

    ref = xla_attention(q, k, v, bias)

    fn = shard_map(
        lambda q, k, v, m: ulysses_attention(
            q, k, v, axis_name="sp", kv_mask=m, attention_impl="xla"
        ),
        mesh=sp_mesh,
        in_specs=(
            P(None, None, "sp", None), P(None, None, "sp", None),
            P(None, None, "sp", None), P(None, "sp"),
        ),
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_cross_attention_matches(sp_mesh):
    """Token-sharded queries against replicated short kv (text tokens)."""
    b, h, nq, lkv, d = 1, 8, 256, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, nq, d))
    k = jax.random.normal(ks[1], (b, h, lkv, d))
    v = jax.random.normal(ks[2], (b, h, lkv, d))

    ref = xla_attention(q, k, v)
    fn = shard_map(
        partial(ulysses_cross_attention, axis_name="sp", attention_impl="xla"),
        mesh=sp_mesh,
        in_specs=(P(None, None, "sp", None), P(), P()),
        out_specs=P(None, None, "sp", None),
    )
    out = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
