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


def dit_param_sharding(
    mesh: Mesh, dit_params, mode: str = "fsdp", min_size: int = 2**16
):
    """Megatron-style tensor parallelism for the DiT over the 'tp' axis,
    composed with the fsdp rules:

    - attn to_q/to_k/to_v and ff proj_in: column-parallel (output dim over
      'tp' — heads/FFN columns split, no communication inside);
    - attn to_out and ff proj_out: row-parallel (input dim over 'tp'; XLA
      inserts the psum after the matmul);
    - everything else follows :func:`param_sharding`.

    The reference has no TP at all (SURVEY §2.11); this covers >1-chip
    inference of larger DiT variants.
    """
    tp = mesh.shape["tp"]
    base = param_sharding(mesh, dit_params, mode=mode, min_size=min_size)
    if tp == 1:
        return base

    fsdp = mesh.shape["fsdp"]

    def linear_spec(kernel, shard_axis: int) -> NamedSharding:
        shape = kernel.shape
        spec = [None, None]
        if shape[shard_axis] % tp == 0:
            spec[shard_axis] = "tp"
        other = 1 - shard_axis
        if mode == "fsdp" and fsdp > 1 and shape[other] % fsdp == 0:
            spec[other] = "fsdp"
        return NamedSharding(mesh, P(*spec))

    def shard_attn(attn, base_attn):
        out = dict(base_attn)
        for name, axis in (("to_q", 1), ("to_k", 1), ("to_v", 1), ("to_out", 0)):
            p = dict(out[name])
            p["kernel"] = linear_spec(attn[name]["kernel"], axis)
            if "bias" in attn[name] and axis == 1:
                p["bias"] = NamedSharding(mesh, P("tp"))
            out[name] = p
        return out

    result = jax.tree.map(lambda s: s, base)  # copy structure
    for i, block in enumerate(dit_params["blocks"]):
        for attn_name in ("attn1", "attn2"):
            result["blocks"][i][attn_name] = shard_attn(
                block[attn_name], base["blocks"][i][attn_name]
            )
        ff = block["ff"]
        ff_spec = dict(result["blocks"][i]["ff"])
        pin = dict(ff_spec["proj_in"])
        pin["kernel"] = linear_spec(ff["proj_in"]["kernel"], 1)
        if "bias" in ff["proj_in"]:
            pin["bias"] = NamedSharding(mesh, P("tp"))
        pout = dict(ff_spec["proj_out"])
        pout["kernel"] = linear_spec(ff["proj_out"]["kernel"], 0)
        ff_spec["proj_in"], ff_spec["proj_out"] = pin, pout
        result["blocks"][i]["ff"] = ff_spec
    return result


def opt_state_sharding(
    mesh: Mesh, opt_state, params_sharding, mode: str = "fsdp",
    min_size: int = 2**16,
):
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
        if not shape or int(np.prod(shape)) < min_size:
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
