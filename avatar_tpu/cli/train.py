"""Training CLI: LoRA / full fine-tune of the avatar DiT on latent pairs.

Re-design of `/root/reference/ltx_video/training.py:228-548` +
``training_deepspeed.py`` (whose multi-GPU role is covered by the sharding
mesh — one process, no launcher):

  python -m avatar_tpu.cli.train --config configs/train-avatars.yaml \
      --train_mode lora_audio

Differences from the reference (deliberate):
- The whole macro-batch (micro-steps x grad accumulation) is one jitted
  step; metrics come back once per optimizer update, matching the
  reference's wandb step cadence (training.py:205-220).
- Checkpoints: reference-compatible merged safetensors every
  save_every_n_epochs (with a correctly-tracked best loss — the reference
  never updates best_loss, training.py:315,395) plus orbax resume state.
- DP/ZeRO2/FSDP come from TrainConfig.sharding_mode over the device mesh.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

TRAIN_PROMPT = "Person speaking naturally, with natual face and body movements"


def encode_train_prompt(config, caption_channels: int = 4096):
    """T5-encode the fixed training prompt (training.py:511-542); falls back
    to a stored embeddings file, then to zeros with a warning."""
    if getattr(config, "prompt_embeds_path", None):
        from avatar_tpu.utils.safetensors_io import load_safetensors

        t, _ = load_safetensors(config.prompt_embeds_path)
        return jnp.asarray(t["prompt_embeds"]), jnp.asarray(
            t["prompt_attention_mask"]
        )
    try:
        from transformers import T5TokenizerFast

        from avatar_tpu.models.t5 import encode_prompt, load_t5_encoder

        model_path = getattr(
            config, "text_encoder_model_name_or_path",
            "PixArt-alpha/PixArt-XL-2-1024-MS",
        )
        t5_cfg, t5_params = load_t5_encoder(model_path)
        tokenizer = T5TokenizerFast.from_pretrained(model_path, subfolder="tokenizer")
        return encode_prompt(t5_params, t5_cfg, tokenizer, TRAIN_PROMPT)
    except Exception as e:  # no local T5 weights
        print(f"[train] T5 unavailable ({e}); using zero prompt embeddings")
        return (
            jnp.zeros((1, 256, caption_channels), jnp.float32),
            jnp.ones((1, 256)),
        )


def decoder_train_loop(config, resume: bool = True):
    """VAE-decoder fine-tuning (train_mode "decoder" / `decoder_train: true`):
    the reference's bit-rotted decoder-train design made functional — see
    train/decoder.py. Needs {stem}_pixels.npy targets beside the encoder
    latents (cli.preprocess save-vae-latents --save_pixels). Data-parallel
    only; exports a drop-in single-file checkpoint per epoch."""
    from avatar_tpu.data.dataset import (
        LatentPairDataset, epoch_batches, prefetch_batches,
    )
    from avatar_tpu.models.dit import DiTConfig
    from avatar_tpu.models.vae import VAEConfig
    from avatar_tpu.train.checkpoints import TrainStateCheckpointer
    from avatar_tpu.train.decoder import (
        init_decoder_trainable, make_decoder_train_step,
        merge_decoder_trainable,
    )
    from avatar_tpu.train.train import make_lr_schedule, make_optimizer
    from avatar_tpu.utils.metrics import MetricsLogger
    from avatar_tpu.utils.weight_import import (
        export_vae_state, import_transformer_state, import_vae_state,
        load_single_file_checkpoint, save_single_file_checkpoint,
    )

    configs, t_state, v_state = load_single_file_checkpoint(
        config.checkpoint_path
    )
    vae_cfg = VAEConfig.from_dict(configs["vae"])
    vae_params = import_vae_state(v_state, vae_cfg)
    if config.precision in ("bfloat16", "bf16"):
        vae_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vae_params)

    dataset = LatentPairDataset(
        config.condition_latents_dir, config.encoder_latents_dir
    )
    # validate EVERY stem up front: collate_latent_pairs drops the 'pixels'
    # key when presence is mixed within a batch, which would otherwise
    # surface mid-epoch as an opaque KeyError inside the jitted step
    missing = [
        s
        for s in dataset.items
        if not (dataset.encoder_dir / f"{s}_pixels.npy").exists()
    ]
    if len(dataset) == 0 or missing:
        raise ValueError(
            "decoder training needs {stem}_pixels.npy pixel targets beside "
            "the encoder latents — rerun `cli.preprocess save-vae-latents "
            "--save_pixels`"
            + (
                f" (missing for {len(missing)}/{len(dataset)} clips, e.g. "
                f"{missing[:3]})"
                if missing
                else ""
            )
        )
    steps_per_epoch = len(dataset) // (
        config.batch_size * config.gradient_accumulation_steps
    )
    total_steps = steps_per_epoch * (config.num_epochs or 0)
    lr_fn = make_lr_schedule(config, total_steps)

    trainable = init_decoder_trainable(vae_params)
    optimizer = make_optimizer(config, total_steps)
    opt_state = optimizer.init(trainable)
    step_fn = make_decoder_train_step(vae_cfg, config, optimizer)

    n_dev = len(jax.devices())
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("data",))
    batch_sharding = jax.sharding.NamedSharding(
        mesh,
        jax.sharding.PartitionSpec(None, "data")
        if config.batch_size % n_dev == 0
        else jax.sharding.PartitionSpec(),
    )

    logger = MetricsLogger(
        output_dir=config.output_dir,
        wandb_project=config.wandb_project,
        wandb_run_name=config.wandb_run_name,
        wandb_config={"mode": "decoder", "batch_size": config.batch_size,
                      "learning_rate": config.learning_rate,
                      "decoder_t_max": config.decoder_t_max},
    )
    if config.decoder_loss_lpips_weight:
        print("[train] decoder_loss_lpips_weight > 0 but lpips is not "
              "installed — LPIPS term skipped (L1 only)")

    checkpointer = None
    global_step = 0
    start_epoch = 0
    if config.output_dir:
        checkpointer = TrainStateCheckpointer(
            Path(config.output_dir) / "state"
        )
        if resume and checkpointer.latest_step() is not None:
            step, restored = checkpointer.restore(
                template={"trainable": trainable, "opt_state": opt_state,
                          "extra": {"epoch": 0}}
            )
            trainable = restored["trainable"]
            opt_state = restored["opt_state"]
            global_step = step
            start_epoch = int(restored.get("extra", {}).get("epoch", 0))
            print(f"[train] resumed decoder training from step {global_step}")

    key = jax.random.PRNGKey(config.seed + 2)
    for epoch in range(start_epoch, config.num_epochs or 0):
        losses = []
        for batch in prefetch_batches(
            epoch_batches(dataset, config.batch_size,
                          config.gradient_accumulation_steps,
                          seed=config.seed, epoch=epoch),
            device_put=lambda v: jax.device_put(jnp.asarray(v), batch_sharding),
        ):
            key, k_step = jax.random.split(key)
            arrays = {k: v for k, v in batch.items() if k != "stem"}
            trainable, opt_state, metrics = step_fn(
                trainable, opt_state, vae_params, arrays, k_step
            )
            global_step += 1
            loss = float(metrics["loss"])
            losses.append(loss)
            if global_step % config.log_every_n_steps == 0:
                logger.log(global_step, {
                    "train/decoder_loss": loss,
                    "train/decoder_l1": float(metrics["decoder_l1"]),
                    "train/decoder_psnr": float(metrics["decoder_psnr"]),
                    "train/epoch": epoch,
                    "train/lr": float(lr_fn(global_step))
                    if callable(lr_fn) else lr_fn,
                })
        epoch_loss = sum(losses) / len(losses) if losses else 0.0
        print(f"Decoder epoch {epoch + 1} finished. "
              f"Average loss: {epoch_loss:.6f}")

        if config.output_dir and (epoch + 1) % config.save_every_n_epochs == 0:
            merged = merge_decoder_trainable(vae_params, trainable)
            dit_cfg = DiTConfig.from_dict(configs["transformer"])
            dit_params = import_transformer_state(t_state, dit_cfg)
            path = Path(config.output_dir) / f"vae_epoch_{epoch + 1}.safetensors"
            save_single_file_checkpoint(
                path, dit_params, dit_cfg,
                vae_state=export_vae_state(merged, vae_cfg),
                vae_config=configs["vae"],
                scheduler_config=configs.get("scheduler"),
            )
            del dit_params
            print(f"[train] saved {path}")
            if checkpointer is not None:
                checkpointer.save(global_step, trainable, opt_state,
                                  extra={"epoch": epoch + 1})

    if checkpointer is not None:
        checkpointer.manager.wait_until_finished()
        checkpointer.close()
    logger.finish()
    print("Decoder training complete!")
    return trainable


def train_loop(config, resume: bool = True):
    if config.decoder_train or config.train_mode == "decoder":
        return decoder_train_loop(config, resume=resume)
    from avatar_tpu.data.dataset import (
        LatentPairDataset, epoch_batches, prefetch_batches,
    )
    from avatar_tpu.models.dit import DiTConfig
    from avatar_tpu.parallel import (
        gather_to_host, global_batch_from_local, is_main_process, make_mesh,
        param_sharding, shard_pytree_global, sync_processes,
    )
    from avatar_tpu.train.checkpoints import (
        TrainStateCheckpointer, export_training_checkpoint,
    )
    from avatar_tpu.train.train import (
        ema_params, init_trainable, make_lr_schedule, make_optimizer,
        make_train_step, validate_step_fn,
    )
    from avatar_tpu.utils.metrics import MetricsLogger
    from avatar_tpu.utils.weight_import import (
        import_transformer_state, load_single_file_checkpoint,
    )

    # -- multi-host context (jax.distributed must already be initialized by
    # main() / the caller when running as one process of a pod job) --
    n_proc = jax.process_count()
    pid = jax.process_index()
    main_proc = is_main_process()
    if n_proc > 1 and main_proc:
        print(f"[train] multi-host: {n_proc} processes, "
              f"{len(jax.devices())} global devices")

    # -- model --
    configs, t_state, _ = load_single_file_checkpoint(config.checkpoint_path)
    dit_cfg = DiTConfig.from_dict(configs["transformer"])
    dit_params = import_transformer_state(t_state, dit_cfg)
    if config.precision in ("bfloat16", "bf16"):
        dit_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), dit_params)
    # Split-RoPE layout for lora_audio training: the permutation touches
    # only frozen attn1 q/k columns (LoRA targets attn2; caption_projection
    # untouched), so exported checkpoints stay canonical while the forward
    # takes the RoPE-fused attention kernel and the backward skips the
    # interleaved rotation's gather/relayout passes.
    rope_split = config.train_mode == "lora_audio"
    if rope_split:
        from avatar_tpu.models.dit import permute_dit_params_for_split_rope

        dit_params = permute_dit_params_for_split_rope(dit_params, dit_cfg)

    # -- data (before the optimizer: LR schedules need the step horizon) --
    dataset = LatentPairDataset(
        config.condition_latents_dir, config.encoder_latents_dir
    )
    val_dataset = None
    if config.val_condition_latents_dir and config.val_encoder_latents_dir:
        val_dataset = LatentPairDataset(
            config.val_condition_latents_dir, config.val_encoder_latents_dir
        )
    if main_proc:
        print(f"[train] {len(dataset)} train clips"
              + (f", {len(val_dataset)} val clips" if val_dataset else ""))
    steps_per_epoch = len(dataset) // (
        config.batch_size * config.gradient_accumulation_steps
    )
    total_steps = steps_per_epoch * (config.num_epochs or 0)
    lr_fn = make_lr_schedule(config, total_steps)

    # -- mesh + sharding --
    optimizer = make_optimizer(config, total_steps)
    pp_mesh = None
    sp_mesh = None
    if config.sharding_mode == "sp":
        # Context parallelism: params/trainable/optimizer replicated, the
        # denoiser's token axis sharded over 'sp' (Ulysses or ring attention
        # per config.sp_impl; parallel/sequence.py), batch optionally
        # sharded over 'data' (mesh_data). Long-context training — one
        # sample's activations split across chips.
        n_dev = len(jax.devices())
        data = config.mesh_data if config.mesh_data > 0 else 1
        if n_dev % data or n_dev // data < 2:
            raise ValueError(
                f"sharding_mode=sp needs mesh_data ({data}) to divide the "
                f"{n_dev} devices with an sp axis >= 2"
            )
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()).reshape(data, n_dev // data),
            ("data", "sp"),
        )
        sp_mesh = mesh
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        p_shard = jax.tree.map(lambda _: rep, dit_params)
        dit_params = shard_pytree_global(dit_params, p_shard)
        trainable = init_trainable(
            jax.random.PRNGKey(config.seed), dit_params, dit_cfg, config
        )
        t_shard = jax.tree.map(lambda _: rep, trainable)
        trainable = shard_pytree_global(trainable, t_shard)
        opt_state = optimizer.init(trainable)
        o_shard = jax.tree.map(lambda _: rep, opt_state)
        opt_state = shard_pytree_global(opt_state, o_shard)
    elif config.sharding_mode == "pp":
        # GPipe pipeline parallelism: blocks stacked [L, ...] and
        # stage-sharded over 'pp'; remaining devices form a 'data' axis
        # (parallel/pipeline.py). lora_audio only.
        from avatar_tpu.parallel.pipeline import (
            make_pp_mesh, pp_param_sharding, stack_block_params,
        )

        if config.train_mode != "lora_audio":
            raise ValueError("sharding_mode=pp supports train_mode "
                             "lora_audio only")
        n_dev = len(jax.devices())
        if n_dev % config.pp_stages or config.pp_stages < 2:
            raise ValueError(
                f"pp_stages={config.pp_stages} must be >=2 and divide the "
                f"{n_dev} devices"
            )
        mesh = make_pp_mesh(
            pp=config.pp_stages, data=n_dev // config.pp_stages
        )
        pp_mesh = mesh
        dit_params = dict(
            dit_params, blocks=stack_block_params(dit_params["blocks"])
        )
        p_shard = pp_param_sharding(mesh, dit_params)
        dit_params = shard_pytree_global(dit_params, p_shard)

        trainable = init_trainable(
            jax.random.PRNGKey(config.seed), dit_params, dit_cfg, config
        )
        trainable["lora"] = dict(
            trainable["lora"],
            blocks=stack_block_params(trainable["lora"]["blocks"]),
        )
        t_shard = {
            "lora": pp_param_sharding(mesh, trainable["lora"]),
            "caption_projection": jax.tree.map(
                lambda _: jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                ),
                trainable["caption_projection"],
            ),
        }
        trainable = shard_pytree_global(trainable, t_shard)

        # moments (zeros_like) inherit the stage sharding from the placed
        # trainable; scalars optax creates fresh (e.g. count) come back
        # single-device — pin those replicated on the mesh
        opt_state = optimizer.init(trainable)
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        o_shard = jax.tree.map(
            lambda x: x.sharding
            if isinstance(getattr(x, "sharding", None),
                          jax.sharding.NamedSharding) else rep,
            opt_state,
        )
        opt_state = shard_pytree_global(opt_state, o_shard)
    else:
        mesh = make_mesh(data=config.mesh_data, fsdp=config.mesh_fsdp)
        p_shard = param_sharding(mesh, dit_params, mode=config.sharding_mode)
        dit_params = shard_pytree_global(dit_params, p_shard)

        trainable = init_trainable(jax.random.PRNGKey(config.seed), dit_params,
                                   dit_cfg, config)
        t_shard = param_sharding(mesh, trainable, mode=config.sharding_mode)
        trainable = shard_pytree_global(trainable, t_shard)

        opt_state = optimizer.init(trainable)
        o_shard = None
        if config.sharding_mode in ("zero2", "fsdp"):
            # ZeRO-2: params replicated but optimizer moments sharded over
            # 'fsdp' (fsdp mode shards them consistently with the params).
            from avatar_tpu.parallel import opt_state_sharding

            o_shard = opt_state_sharding(
                mesh, opt_state, t_shard, mode=config.sharding_mode
            )
            opt_state = shard_pytree_global(opt_state, o_shard)
    step_fn = make_train_step(
        dit_cfg, config, optimizer,
        trainable_sharding=t_shard, opt_state_sharding=o_shard,
        rope_split=rope_split, pp_mesh=pp_mesh, sp_mesh=sp_mesh,
    )
    val_fn = validate_step_fn(dit_cfg, config, rope_split=rope_split,
                              pp_mesh=pp_mesh, sp_mesh=sp_mesh)

    prompt_embeds, prompt_mask = encode_train_prompt(
        config, dit_cfg.caption_channels
    )

    # -- logging / checkpoints --
    n_trainable = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(trainable))
    n_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(dit_params))
    if main_proc:
        print(f"[params] total={n_total} trainable={n_trainable}")
    # non-main processes get a no-op logger (rank-0 gating,
    # training_deepspeed.py:110-129)
    logger = MetricsLogger(
        output_dir=config.output_dir if main_proc else None,
        wandb_project=config.wandb_project if main_proc else None,
        wandb_run_name=config.wandb_run_name,
        wandb_config={
            "batch_size": config.batch_size,
            "learning_rate": config.learning_rate,
            "num_epochs": config.num_epochs,
            "lora_rank": config.lora_rank,
            "lora_alpha": config.lora_alpha,
            "checkpoint_path": config.checkpoint_path,
            "precision": config.precision,
        },
    )
    logger.set_summary(trainable_params=n_trainable, total_params=n_total)

    checkpointer = None
    global_step = 0
    start_epoch = 0
    if config.output_dir:
        checkpointer = TrainStateCheckpointer(Path(config.output_dir) / "state")
        if resume and checkpointer.latest_step() is not None:
            step, restored = checkpointer.restore(
                template={"trainable": trainable, "opt_state": opt_state,
                          "extra": {"epoch": 0}}
            )
            # orbax restores onto default devices; re-place on the mesh
            trainable = shard_pytree_global(restored["trainable"], t_shard)
            if config.sharding_mode not in ("pp", "sp"):
                from avatar_tpu.parallel import opt_state_sharding

                o_shard = opt_state_sharding(
                    mesh, opt_state, t_shard, mode=config.sharding_mode
                )
            opt_state = shard_pytree_global(restored["opt_state"], o_shard)
            global_step = step
            start_epoch = int(restored.get("extra", {}).get("epoch", 0))
            print(f"[train] resumed from step {global_step} (epoch {start_epoch})")

    best_loss = float("inf")
    key = jax.random.PRNGKey(config.seed + 1)

    # Preemption-safe checkpointing: TPU pods get SIGTERM ahead of
    # maintenance/preemption; save the full train state and exit cleanly so
    # the next invocation resumes from the same step (the reference restarts
    # training from scratch, SURVEY §5 "no optimizer-state checkpointing").
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print("[train] SIGTERM received — checkpointing at next step boundary")

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (e.g. under a test harness)

    # batch arrays are [accum, micro_b, ...]: shard micro_b over the batch
    # axes of the mesh (data+fsdp; just 'data' under pipeline parallelism)
    batch_axes = tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)
    batch_axes = batch_axes or ("data",)
    n_batch_shards = int(np.prod([mesh.shape.get(a, 1) for a in batch_axes]))
    if config.batch_size % n_batch_shards == 0:
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, batch_axes)
        )
    else:
        if n_proc > 1:
            raise ValueError(
                f"multi-host training requires batch_size "
                f"({config.batch_size}) divisible by the "
                f"{n_batch_shards}-device batch axis"
            )
        print(
            f"[train] batch_size {config.batch_size} not divisible by "
            f"{n_batch_shards} devices — replicating batches (no DP speedup)"
        )
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )

    def drain_metrics(pending, losses, epoch):
        """Fetch + log the PREVIOUS step's metrics — the fetch then overlaps
        the current step's device execution instead of stalling the host on
        every step (round-2 host gap: 344 ms wall vs 294 ms device)."""
        if pending is None:
            return
        gstep, metrics = pending
        loss = float(metrics["loss"])
        losses.append(loss)
        if gstep % config.log_every_n_steps == 0:
            logger.log(gstep, {
                "train/loss": loss,
                "train/rel_mse": float(metrics["rel_mse"]),
                "train/nrmse": float(metrics["nrmse"]),
                "train/transformer_mse": float(metrics["transformer_mse"]),
                "train/epoch": epoch,
                "train/lr": float(lr_fn(gstep)) if callable(lr_fn) else lr_fn,
            })

    with mesh:
        for epoch in range(start_epoch, config.num_epochs or 0):
            losses = []
            pending = None

            def to_device(v):
                if n_proc > 1:
                    # v holds only this host's rows: [accum, local_b, ...]
                    return global_batch_from_local(
                        batch_sharding, v, config.batch_size, axis=1
                    )
                return jax.device_put(jnp.asarray(v), batch_sharding)

            for batch in prefetch_batches(
                epoch_batches(
                    dataset, config.batch_size,
                    config.gradient_accumulation_steps,
                    seed=config.seed, epoch=epoch,
                    process_index=pid, process_count=n_proc,
                ),
                device_put=to_device,
            ):
                key, k_step = jax.random.split(key)
                arrays = {
                    k: v for k, v in batch.items() if k != "stem"
                }
                trainable, opt_state, metrics = step_fn(
                    trainable, opt_state, dit_params, arrays,
                    prompt_embeds, prompt_mask, k_step,
                )
                global_step += 1
                drain_metrics(pending, losses, epoch)
                pending = (global_step, metrics)
                if preempted["flag"]:
                    drain_metrics(pending, losses, epoch)
                    if checkpointer is not None:
                        checkpointer.save(
                            global_step, trainable, opt_state,
                            extra={"epoch": epoch},
                        )
                        checkpointer.manager.wait_until_finished()
                        if main_proc:
                            print(f"[train] preemption checkpoint at step "
                                  f"{global_step}; exiting")
                    logger.finish()
                    return trainable
            drain_metrics(pending, losses, epoch)

            epoch_loss = sum(losses) / len(losses) if losses else 0.0
            logger.log(global_step, {"train/epoch_loss": epoch_loss})
            if main_proc:
                print(f"Epoch {epoch + 1} finished. "
                      f"Average loss: {epoch_loss:.6f}")

            if val_dataset is not None:
                val_sharding = jax.sharding.NamedSharding(
                    mesh,
                    jax.sharding.PartitionSpec(batch_axes)
                    if config.batch_size % n_batch_shards == 0
                    else jax.sharding.PartitionSpec(),
                )

                def val_to_device(v):
                    if n_proc > 1:
                        return global_batch_from_local(
                            val_sharding, v, config.batch_size, axis=0
                        )
                    return jax.device_put(jnp.asarray(v), val_sharding)

                val_losses = []
                for batch in epoch_batches(
                    val_dataset, config.batch_size, 1,
                    seed=0, epoch=0, shuffle=False,
                    process_index=pid, process_count=n_proc,
                ):
                    micro = {
                        k: val_to_device(v[0]) for k, v in batch.items()
                        if k != "stem"
                    }
                    m = val_fn(trainable, dit_params, micro,
                               prompt_embeds, prompt_mask,
                               jax.random.PRNGKey(epoch))
                    val_losses.append(float(m["loss"]))
                if val_losses:
                    val_loss = sum(val_losses) / len(val_losses)
                    logger.log(global_step, {"val/loss": val_loss,
                                             "val/epoch": epoch})
                    if main_proc:
                        print(f"Validation epoch {epoch + 1}, "
                              f"loss: {val_loss:.6f}")

            if config.output_dir and (epoch + 1) % config.save_every_n_epochs == 0:
                is_best = epoch_loss < best_loss
                best_loss = min(best_loss, epoch_loss)
                def to_host_canonical(tree, is_trainable):
                    if n_proc > 1:
                        # collective all-gather of (possibly fsdp-sharded)
                        # weights to host, then rank-0 writes — the ZeRO-3
                        # gather-to-rank0 export, TPU style
                        tree = gather_to_host(tree)
                    if config.sharding_mode == "pp":
                        # exports are canonical per-block lists, not stacked
                        from avatar_tpu.parallel.pipeline import (
                            unstack_block_params,
                        )

                        if is_trainable:
                            tree = dict(
                                tree,
                                lora=dict(
                                    tree["lora"],
                                    blocks=unstack_block_params(
                                        tree["lora"]["blocks"]
                                    ),
                                ),
                            )
                        else:
                            tree = dict(
                                tree,
                                blocks=unstack_block_params(tree["blocks"]),
                            )
                    return tree

                host_params = to_host_canonical(dit_params, False)
                host_trainable = to_host_canonical(trainable, True)
                if main_proc:
                    path = export_training_checkpoint(
                        Path(config.output_dir)
                        / f"model_epoch_{epoch + 1}.safetensors",
                        host_params, dit_cfg, host_trainable, config,
                        metadata={"epoch": str(epoch + 1),
                                  "global_step": str(global_step)},
                        is_best=is_best,
                    )
                    print(f"[train] saved {path}")
                if config.ema_decay > 0:
                    host_ema = to_host_canonical(ema_params(opt_state), True)
                    if main_proc:
                        path = export_training_checkpoint(
                            Path(config.output_dir)
                            / f"model_epoch_{epoch + 1}_ema.safetensors",
                            host_params, dit_cfg, host_ema, config,
                            metadata={"epoch": str(epoch + 1),
                                      "global_step": str(global_step),
                                      "ema_decay": str(config.ema_decay)},
                        )
                        print(f"[train] saved {path}")
                sync_processes("export")
                checkpointer.save(
                    global_step, trainable, opt_state,
                    extra={"epoch": epoch + 1},
                )

    if checkpointer is not None:
        checkpointer.manager.wait_until_finished()
        checkpointer.close()
    logger.finish()
    if main_proc:
        print("Training complete!")
    return trainable


def main():
    parser = argparse.ArgumentParser(description="avatar_tpu training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument(
        "--train_mode", type=str, choices=["full", "lora_audio", "decoder"],
        default="full"
    )
    parser.add_argument("--no_resume", action="store_true")
    # multi-host (TPU pod / CPU cluster) launch flags. On TPU pods these can
    # all be omitted: jax.distributed.initialize auto-detects from the
    # environment (parallel.distributed._CLUSTER_ENV_VARS). The reference
    # needed the DeepSpeed launcher for this (training_deepspeed.py:90-96).
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (process 0)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, _ = parser.parse_known_args()

    from avatar_tpu.parallel import initialize

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from avatar_tpu.core.config import load_train_config_from_yaml

    config = load_train_config_from_yaml(args.config)
    config.train_mode = args.train_mode
    train_loop(config, resume=not args.no_resume)


if __name__ == "__main__":
    main()
