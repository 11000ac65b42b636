"""Device mesh + sharding rules — the TPU-native replacement for the
reference's DeepSpeed ZeRO stack (`training_deepspeed.py:90-94`,
`configs/ds_config_zero{2,3}.json`).

Axes:
  data — batch parallelism (per-rank dataloaders in the reference)
  fsdp — parameter/optimizer sharding (ZeRO-2/3 parity)
  tp   — optional tensor parallelism over attention heads / FFN columns

No explicit communication layer is needed: parameters and batches carry
``NamedSharding`` annotations and XLA emits all-gather / reduce-scatter over
ICI, covering what ds_config_zero3.json's prefetch/bucket knobs hand-tune.

Modes (TrainConfig.sharding_mode):
  dp    — params + opt state replicated (DeepSpeed engine replication)
  zero2 — params replicated, optimizer state sharded over fsdp
  fsdp  — params + optimizer state sharded over fsdp (ZeRO-3)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'fsdp', 'tp') mesh. data=-1 absorbs the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        data = n // (fsdp * tp)
    assert data * fsdp * tp == n, f"mesh {data}x{fsdp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp, tp)
    return Mesh(arr, axis_names=("data", "fsdp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data (and fsdp, which also consumes batch in
    FSDP training — standard ZeRO data layout)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def param_sharding(mesh: Mesh, params, mode: str = "fsdp", min_size: int = 2**16):
    """Per-leaf NamedSharding pytree for model params."""
    axis = mesh.shape["fsdp"]

    def spec_for(leaf):
        if mode in ("dp", "zero2") or axis == 1:
            return NamedSharding(mesh, P())
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        # shard the largest divisible axis along 'fsdp'
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[i] % axis == 0:
                spec = [None] * len(shape)
                spec[i] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def opt_state_sharding(mesh: Mesh, opt_state, params_sharding, mode: str = "fsdp"):
    """Optimizer-state sharding: ZeRO-2 shards moments over 'fsdp' even when
    params are replicated; fsdp mode mirrors the param shardings; dp
    replicates everything.

    optax state pytrees contain leaves shaped like params (mu, nu) plus
    scalars (count); leaves that match a param shape get that param's spec.
    """
    axis = mesh.shape["fsdp"]
    flat_params, _ = jax.tree.flatten(params_sharding)

    if mode == "dp" or axis == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state)

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < 2**16:
            return NamedSharding(mesh, P())
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[i] % axis == 0:
                spec = [None] * len(shape)
                spec[i] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, opt_state)


def shard_pytree(tree, shardings):
    """Device-put a pytree according to a sharding pytree."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
