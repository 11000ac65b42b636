from avatar_tpu.parallel.mesh import (
    dit_param_sharding,
    make_mesh,
    batch_sharding,
    param_sharding,
    opt_state_sharding,
    replicated,
    shard_pytree,
)

__all__ = [
    "dit_param_sharding",
    "make_mesh",
    "batch_sharding",
    "param_sharding",
    "opt_state_sharding",
    "replicated",
    "shard_pytree",
]
