from avatar_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    opt_state_sharding,
    replicated,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding",
    "opt_state_sharding",
    "replicated",
    "shard_pytree",
]
