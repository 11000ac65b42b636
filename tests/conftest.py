"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding paths (data/fsdp/tp meshes) are exercised without TPU hardware.

Must set XLA flags before jax initializes a backend, hence the top-of-file
environment mutation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env pins "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not enough: the ambient axon TPU plugin wins unless the
# config is updated before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_make_parametrize_id(config, val, argname):
    if isinstance(val, str):
        return f"{argname}-{val}"
    return f"{argname}-{repr(val)}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def num_latent_channels():
    return 16
