from avatar_tpu.parallel.distributed import (
    gather_to_host,
    global_batch_from_local,
    initialize,
    is_main_process,
    process_local_slice,
    put_global,
    shard_pytree_global,
    sync_processes,
)
from avatar_tpu.parallel.pipeline import (
    dit_apply_pp,
    make_pp_mesh,
    pp_param_sharding,
    stack_block_params,
    unstack_block_params,
)
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
    "initialize",
    "is_main_process",
    "process_local_slice",
    "global_batch_from_local",
    "put_global",
    "shard_pytree_global",
    "gather_to_host",
    "sync_processes",
    "dit_apply_pp",
    "make_pp_mesh",
    "pp_param_sharding",
    "stack_block_params",
    "unstack_block_params",
]
