"""Standalone worker for the multi-host training test (NOT a pytest file).

Runs a tiny FSDP LoRA train loop on an 8-device ('data','fsdp') mesh in two
configurations:

  python distributed_worker.py single
      one process, 8 virtual CPU devices

  python distributed_worker.py worker <pid> <nproc> <port>
      one of <nproc> localhost processes, 8/<nproc> virtual CPU devices
      each, joined via jax.distributed.initialize — the real multi-host
      code path (global mesh, per-host data via
      make_array_from_process_local_data, cross-host collectives over
      gloo).

Data, seeds, and model init are identical in both modes, so the printed
per-step losses must match: tests/test_distributed.py asserts it.
"""

import json
import os
import sys

mode = sys.argv[1]
if mode == "worker":
    _pid, _nproc, _port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    _local_devices = 8 // _nproc
else:
    _pid, _nproc = 0, 1
    _local_devices = 8

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_local_devices}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if mode == "worker":
    from avatar_tpu.parallel import initialize

    assert initialize(
        coordinator_address=f"localhost:{_port}",
        num_processes=_nproc,
        process_id=_pid,
    )

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from avatar_tpu.core.config import TrainConfig  # noqa: E402
from avatar_tpu.models.dit import DiTConfig, init_dit  # noqa: E402
from avatar_tpu.parallel import (  # noqa: E402
    global_batch_from_local, make_mesh, opt_state_sharding, param_sharding,
    process_local_slice, shard_pytree_global,
)
from avatar_tpu.train.train import (  # noqa: E402
    init_trainable, make_train_step,
)


def main():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 global devices, got {len(devices)}"
    mesh = make_mesh(data=4, fsdp=2, devices=devices)

    dit_cfg = DiTConfig(
        num_attention_heads=4, attention_head_dim=16, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=64,
    )
    cfg = TrainConfig(
        checkpoint_path="distributed-test", learning_rate=1e-3, lora_rank=4,
        lora_alpha=4, rf_log_normal_mu=-0.5, rf_log_normal_sigma=1.0,
        train_mode="lora_audio", gradient_accumulation_steps=2,
        sharding_mode="fsdp",
    )

    params = init_dit(jax.random.PRNGKey(0), dit_cfg)
    p_shard = param_sharding(mesh, params, mode="fsdp", min_size=256)
    params = shard_pytree_global(params, p_shard)

    trainable = init_trainable(jax.random.PRNGKey(1), params, dit_cfg, cfg)
    t_shard = param_sharding(mesh, trainable, mode="fsdp", min_size=256)
    trainable = shard_pytree_global(trainable, t_shard)

    # SGD, not AdamW: Adam's first-step g/|g| normalization amplifies the
    # ~1e-7 cross-host collective reduction-order noise into sign-level
    # update flips, which would force a useless multi-percent tolerance.
    # With SGD the losses must match the single-process run to ~1e-6.
    import optax

    opt = optax.sgd(1e-2)
    opt_state = opt.init(trainable)
    o_shard = opt_state_sharding(mesh, opt_state, t_shard, mode="fsdp",
                                 min_size=256)
    opt_state = shard_pytree_global(opt_state, o_shard)

    step = make_train_step(
        dit_cfg, cfg, opt, attention_impl="xla",
        trainable_sharding=t_shard, opt_state_sharding=o_shard,
    )

    accum, b = 2, 8
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, ("data", "fsdp"))
    )
    embeds = jnp.asarray(
        np.random.default_rng(99).standard_normal((1, 16, 64), dtype=np.float32)
    )
    mask = jnp.ones((1, 16))

    losses = []
    with mesh:
        for i in range(3):
            rng = np.random.default_rng(1000 + i)
            # every process generates the FULL deterministic batch, then
            # keeps only its own rows — exercising the per-host input path
            full = {
                "latents": rng.standard_normal(
                    (accum, b, 3, 4, 4, 16)).astype(np.float32),
                "pose_latents": rng.standard_normal(
                    (accum, b, 3, 4, 4, 16)).astype(np.float32),
                "ref_image_latents": rng.standard_normal(
                    (accum, b, 1, 4, 4, 16)).astype(np.float32),
            }
            sl = process_local_slice(b)
            batch = {
                k: global_batch_from_local(
                    batch_sharding, v[:, sl], b, axis=1
                )
                for k, v in full.items()
            }
            trainable, opt_state, metrics = step(
                trainable, opt_state, params, batch, embeds, mask,
                jax.random.PRNGKey(42 + i),
            )
            losses.append(float(metrics["loss"]))

    print("LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
