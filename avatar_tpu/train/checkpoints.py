"""Training checkpointing.

Two layers, mirroring + extending the reference
(`/root/reference/ltx_video/utils/torch_utils.py:39-133`):

1. **Interchange export** — single-file safetensors with LoRA merged into
   base weights and transformer/scheduler/vae config embedded in metadata
   (``save_training_checkpoint`` parity, incl. the ``best_`` prefix; the
   reference's never-updated ``best_loss`` bug is fixed by the caller
   actually tracking the best loss).
2. **Resume state** — orbax checkpoints of (trainable, opt_state, step),
   which the reference lacks entirely (SURVEY §5: "no optimizer/step resume
   anywhere").
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from avatar_tpu.core.config import TrainConfig
from avatar_tpu.models.dit import DiTConfig
from avatar_tpu.train.lora import lora_scale, merge_lora
from avatar_tpu.train.train import overlay_params
from avatar_tpu.utils.weight_import import save_single_file_checkpoint


def export_training_checkpoint(
    target_path: str | Path,
    dit_params: dict,
    dit_cfg: DiTConfig,
    trainable: dict,
    cfg: TrainConfig,
    metadata: Optional[Dict[str, Any]] = None,
    is_best: bool = False,
) -> Path:
    """Merge trainable weights (LoRA or full subsets) into the base params
    and write a reference-compatible single-file safetensors."""
    if cfg.train_mode == "lora_audio":
        merged = merge_lora(
            dit_params, trainable["lora"], lora_scale(cfg.lora_rank, cfg.lora_alpha)
        )
        merged = overlay_params(
            merged, {"caption_projection": trainable["caption_projection"]}
        )
    else:
        merged = overlay_params(dit_params, trainable)

    # cast trainable fp32 masters back to the base dtype for export
    base_dtype = dit_params["patchify_proj"]["kernel"].dtype
    merged = jax.tree.map(lambda x: x.astype(base_dtype), merged)

    target_path = Path(target_path)
    if is_best:
        target_path = target_path.with_name("best_" + target_path.name)
    target_path.parent.mkdir(parents=True, exist_ok=True)

    scheduler_config = {
        "_class_name": "RectifiedFlowScheduler",
        "num_train_timesteps": cfg.rf_num_train_timesteps,
        "shifting": cfg.rf_shifting,
        "base_resolution": cfg.rf_base_resolution,
        "target_shift_terminal": cfg.rf_target_shift_terminal,
        "sampler": cfg.rf_sampler,
        "shift": cfg.rf_shift,
    }
    if metadata:
        scheduler_config.update(metadata.pop("scheduler", {}))

    save_single_file_checkpoint(
        target_path, merged, dit_cfg, scheduler_config=scheduler_config
    )
    return target_path


class TrainStateCheckpointer:
    """Orbax-backed (trainable, opt_state, global_step) resume state."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, trainable, opt_state, extra: Optional[dict] = None):
        payload = {"trainable": trainable, "opt_state": opt_state}
        if extra:
            payload["extra"] = extra
        self.manager.save(step, args=ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return step, self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return step, self.manager.restore(step)

    def close(self):
        self.manager.close()
