"""Training perf rows (lora_b8 / decoder_b2 / full_b8) in a FRESH process.

Why a subprocess: the r4 driver artifact recorded full_b8 as
RESOURCE_EXHAUSTED even though the same step measured 405.8 ms when run
alone — after two resolutions x two precisions of the 40-step pipeline plus
the resident int8 T5, the parent client's HBM is fragmented in ways
gc.collect() + jax.clear_caches() cannot fully undo (the r5 in-process OOM
retry also failed). A fresh client gets a fresh server-side allocator.

Weights are cheap-init (bench.cheap_params): training step time is
value-independent, so the rows measure the same program as the pipeline's
real init without a second threefry-bound 2B init.

Prints one line: ``TRAINING_ROWS_JSON {...}`` (bench.py parses it).
Reference perf surface: /root/reference/ltx_video/training.py (train loop).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the persistent compile cache at import)


def main() -> None:
    rows = bench.training_stage(bench.training_comps())
    print("TRAINING_ROWS_JSON " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
