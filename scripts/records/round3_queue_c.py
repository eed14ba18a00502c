#!/usr/bin/env python
"""Round-3 chip queue C: deep-kernel ILP A/B + 64x64 op-level trace.

  ilp       two-subtile ILP variant of the v3 deep kernel vs v3
            (scripts/pallas_v3_ilp_exp.py) — the last untried lever of
            TODO #3 after int8 / tap-packing / mask-elision all measured
            slower.
  trace64   jax.profiler trace of the celeba 64x64 XLA projection step —
            sweep64 eliminated conv-algorithm choice as the cause of the
            38%-of-peak gap; the trace names the actual hot ops.

Same discipline as round3_queue.py. Run: python scripts/round3_queue_c.py
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

def step_ilp():
    run_script("scripts/pallas_v3_ilp_exp.py", ["4096"])


def step_trace64():
    run_script("scripts/profile64.py",
               ["--configs", "celeba.yml", "--trace", "output/traces/p64",
                "--out", "output/results/profile64_celeba.json"])


def step_occupancy64():
    # does the 64x64 projection leave throughput on the table at small
    # batch? (prof64 ran N=256 latents; the MXU could be under-occupied)
    import json

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    for name in ("celeba", "celeba_wide"):
        cfg = load_config(os.path.join("output", "gans", name))
        cfg.projection_kernel = "xla"
        gan = DefenseGAN(cfg)
        gan.load()
        for batch in (256, 512, 1024):
            try:
                v = bench_recon(gan.reconstruct, batch, cfg.image_shape,
                                repeats=2)
            except Exception:
                traceback.print_exc()
                print(f"[occupancy64] {name} batch {batch} FAILED "
                      "(likely HBM) — continuing", flush=True)
                break
            print(json.dumps({"metric": f"{name}_xla_batch{batch}",
                              "recon_per_sec": round(v, 2)}), flush=True)


STEPS = [("ilp", step_ilp), ("trace64", step_trace64),
         ("occupancy64", step_occupancy64)]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue C")
