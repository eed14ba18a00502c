#!/usr/bin/env python
"""Round-3 chip queue B: follow-ups to queue A's measurements.

  sweep64        64x64 projection-path sweep (VERDICT #4 follow-up):
                 prof64 measured XLA at 38%/45% of MXU peak on
                 celeba/imagenet-64 — stride-2 deconv dilation waste is
                 the prime suspect. The phase decomposition (4 stride-1
                 sub-convs per deconv, zero dilation; fastgen
                 variant='phase') exists but was never benched at 64x64.
                 Full-stack s2d IS rejected for 64x64: the probe-dense
                 kernels are ~1% sparse => ~23x FLOP inflation.
  margin_sparse  margin experiment on MNIST-like SPARSE prototypes —
                 separates the margin effect (measured on smooth protos:
                 monotone 0.0 -> 0.68 but short of the paper band) from
                 the sparsity/clipping effect.
  parity         full paper-table re-run under the round-3 defaults
                 (bf16 auto kernel, per-batch attack z0, eval_z0 both,
                 complete bands, f-mnist black-box, paper layout).
                 CW at 200x4 for all models (~saves the 2x25-min
                 full-strength A cells, which rounds 2-3 already measured
                 at 1000x5 with identical defended accuracy).

Same discipline as round3_queue.py (one process, resumable .done
markers). Run: python scripts/round3_queue_b.py [step ...]
"""

import json
import os
import sys
import traceback

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import (QDIR, bench_recon, run_script,  # noqa: E402,F401
                       run_steps)

def step_sweep64():
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    rows = []
    for cfg_name in ("celeba", "imagenet64"):
        for kernel, variant in (("xla", None), ("packed", "conv"),
                                ("packed", "phase")):
            cfg = load_config(os.path.join("output", "gans", cfg_name))
            cfg.projection_kernel = kernel
            if variant:
                cfg.packed_variant = variant
            gan = DefenseGAN(cfg)
            gan.load()
            label = f"{cfg_name}_{kernel}" + (f"_{variant}" if variant
                                              else "")
            try:
                v = bench_recon(gan.reconstruct, 256, cfg.image_shape)
            except Exception:
                traceback.print_exc()
                print(f"[sweep64] {label} FAILED — continuing", flush=True)
                continue
            row = {"metric": label, "recon_per_sec": round(v, 2),
                   "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters}
            print(json.dumps(row), flush=True)
            rows.append(row)
    os.makedirs("output/results", exist_ok=True)
    with open("output/results/sweep64.json", "w") as f:
        json.dump(rows, f, indent=1)


def step_margin_sparse():
    run_script("scripts/margin_experiment.py",
               ["--style", "sparse",
                "--margins", "6", "9", "12", "14"])


def step_parity():
    run_script("scripts/parity.py",
               ["--cw_max_iterations", "200",
                "--cw_binary_search_steps", "4",
                "--eval_z0", "both"])


STEPS = [
    ("sweep64", step_sweep64),
    ("margin_sparse", step_margin_sparse),
    ("parity", step_parity),
]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue B")
