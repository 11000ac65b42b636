"""Torch-free safetensors IO (numpy arrays, bf16 via ml_dtypes).

The reference stores every checkpoint as safetensors with a JSON ``config``
metadata blob (single-file "Comfy" layout,
`/root/reference/ltx_video/models/transformers/transformer3d.py:337-352`,
`utils/torch_utils.py:39-63`).  We read/write the identical format so
checkpoints interchange with the reference tooling, but without importing
torch on the device path.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file as _save_file


def load_safetensors(
    path: str | Path,
) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Load all tensors + metadata from a safetensors file."""
    tensors = {}
    with safe_open(str(path), framework="numpy") as f:
        metadata = f.metadata() or {}
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return tensors, metadata


def save_safetensors(
    tensors: Dict[str, np.ndarray],
    path: str | Path,
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    _save_file(
        {k: np.ascontiguousarray(v) for k, v in tensors.items()},
        str(path),
        metadata=metadata,
    )


def load_config_metadata(path: str | Path) -> dict:
    """Parse the embedded JSON ``config`` metadata of a single-file ckpt."""
    with safe_open(str(path), framework="numpy") as f:
        metadata = f.metadata() or {}
    if "config" not in metadata:
        raise ValueError(f"No 'config' metadata in {path}")
    return json.loads(metadata["config"])
