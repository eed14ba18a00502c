#!/usr/bin/env python
"""Round-3 chip queue W: serving-latency curves for the DefendedPipeline.

scripts/serving_bench.py measures what an operator deploys: calibrated
purify+classify+flag per predict() call, end-to-end wall clock, across
batch sizes — the latency/throughput curve for defended inference. The
reference has no serving surface; the projection-only ceiling for the
large-batch end is bench.py (flagship 3763 bf16 / 5757 int8 recon/s).

Legs:
  - flagship (wide/dim16, R=10/L=200): auto kernel across the full batch
    range, plus the opt-in int8 kernel at its tile-aligned batches;
  - digits (real handwriting, deep arch): auto, serving scale;
  - celeba_wide (64x64, R=2/L=200): auto, smaller range.

Run: python scripts/round3_queue_w.py  (cwd=/root/repo)
"""

import sys
import os

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import run_steps  # noqa: E402


def _bench(cfg, batches, kernel=None, repeats=3):
    import serving_bench
    argv = ["--cfg", cfg, "--model", "A",
            "--batches"] + [str(b) for b in batches] + [
            "--repeats", str(repeats)]
    if kernel:
        argv += ["--kernel", kernel]
    serving_bench.main(argv)


def step_serving_flagship_auto():
    _bench("output/gans/mnist_fast", [1, 16, 256, 1024, 4096, 16384])


def step_serving_flagship_int8():
    # int8 v2i needs batch*rr % 256 == 0 (tile grid); rr=10 -> batch % 128
    _bench("output/gans/mnist_fast", [128, 1024, 4096, 16384],
           kernel="pallas_int8")


def step_serving_digits():
    _bench("output/gans/digits", [1, 16, 256, 1024])


def step_serving_celeba_wide():
    _bench("output/gans/celeba_wide", [1, 16, 64, 256])


STEPS = [
    ("serving_flagship_auto", step_serving_flagship_auto),
    ("serving_flagship_int8", step_serving_flagship_int8),
    ("serving_digits", step_serving_digits),
    ("serving_celeba_wide", step_serving_celeba_wide),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue W")
