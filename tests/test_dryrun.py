"""Standing guard for the driver's multichip dryrun.

Runs ``__graft_entry__.dryrun_multichip(8)`` in a subprocess (it needs its
own XLA device-count flags) and asserts:

- it succeeds (zero2 / fsdp / tp2 / sp8 sweep green), and
- the SPMD partitioner emits NO "Involuntary full rematerialization"
  warnings — round 2 shipped with two of them because un-shard_mapped
  Pallas kernels forced XLA to replicate batch-sharded attention inputs
  (fixed by ops/flash_attention._ambient_kernel_mesh + shard_map).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _dryrun_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.smoke
def test_dryrun_single_row_smoke():
    """One sharded train-step row (FSDP LoRA over an 8-device mesh) for the
    CI smoke subset — the full sweep below covers every mode but takes ~3 min
    on a 1-core host."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; print(g._train_dryrun(8, 'fsdp'))"],
        cwd=str(REPO), env=_dryrun_env(), capture_output=True, text=True,
        timeout=300,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "'mode': 'fsdp'" in out and "'loss':" in out, out
    assert "Involuntary full rematerialization" not in out, out


def test_dryrun_multichip_clean():
    env = _dryrun_env()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "dryrun_multichip(8):" in out and "ok" in out, out
    assert "Involuntary full rematerialization" not in out, (
        "SPMD partitioner warning regression:\n" + out
    )
