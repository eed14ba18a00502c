#!/usr/bin/env python
"""Round-5d chip queue: uint8 ingest on the serving curve.

The round-5b serving rows are input-upload-bound at the fast operating
points (batch-16k: ~1.3 s of latency is the 51 MB float32 upload —
modeled in RESULTS.md round 5b from the measured rows + the int8
projection rate). uint8 ingest (models/generator.py::from_image_space
normalizes on device) cuts that transfer 4x. These legs measure the
DefendedPipeline curve with --input_dtype uint8 at the three operating
points; prediction P8: batch-16k latency drops by ~0.9-1.0 s per row
(uint8 upload ≈ 1/4 of the float32 one), putting encoder (2,50) near
~25k img/s end-to-end, and the clean flag rate stays at target (8-bit
input quantization is what real serving sees anyway).

Run: python scripts/round5d_queue.py [only_leg ...]   (cwd=/root/repo)
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import queue_lib  # noqa: E402


def _script(path, argv=()):
    queue_lib.run_script(path, list(argv))


RUNNERS = {"script": _script}

BASE = ["--cfg", "output/gans/mnist_fast", "--model", "A",
        "--kernel", "pallas_int8", "--batches", "256", "16384",
        "--repeats", "3", "--input_dtype", "uint8"]

LEGS = [
    {"name": "r5d_u8_serving_10x200", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": BASE + ["--clf_dtype", "bfloat16"]},
    {"name": "r5d_u8_serving_2x50", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": BASE + ["--rec_rr", "2", "--rec_iters", "50",
                     "--rec_init", "encoder", "--clf_dtype", "bfloat16"]},
    {"name": "r5d_u8_serving_1x25", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": BASE + ["--rec_rr", "1", "--rec_iters", "25",
                     "--rec_init", "encoder_jitter",
                     "--clf_dtype", "bfloat16"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5d")
