#!/usr/bin/env python
"""Round-3 chip queue: ALL TPU work for the round, one resumable process.

Chip discipline (see CLAUDE.md): one process owns the TPU; steps run
sequentially in-process (each new process pays a multi-minute session
claim); every step is crash-isolated and marked done on disk, so a TPU
worker crash costs one step and a rerun resumes. Device programs stay
under ~60 s (CW chunked at 25, profile scans at 50 steps).

Steps (VERDICT round-2 items in parens):
  bench        two-config driver bench — flagship int8 + deep v3 (#2)
  v3p_ab       padded-x mask-elided deep kernel vs v3 A/B (#5)
  evalz0_fgsm  FGSM --eval_z0 both: restart-stochasticity split (#3)
  evalz0_cw    CW --eval_z0 both (#3)
  margin       FGSM-defended accuracy vs inter-class margin sweep (#1)
  int8v        tie-aware int8 quality gate numbers (#6)
  prof64       64x64 cost decomposition vs v5e peaks (#4)
  celeba_wide_train/eval/bench   64x64 wide operating point (#9)
  trace        jax.profiler trace capture through the tunnel (#8)

Run:  python scripts/round3_queue.py [step ...]   (default: all pending)
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import (QDIR, bench_recon, run_script,  # noqa: E402,F401
                       run_steps)

def step_bench():
    run_script("bench.py", [])


def step_v3p_ab():
    run_script("scripts/pallas_v3p_bench.py", ["4096"])


def _evalz0(attack, extra):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/mnist_fast",
                   "--attack_type", attack, "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", "256",
                   "--eval_z0", "both"] + extra)


def step_evalz0_fgsm():
    _evalz0("fgsm", [])


def step_evalz0_cw():
    _evalz0("cw", ["--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4", "--cw_abort_early",
                   "--cw_chunk_iters", "25"])


def step_margin():
    run_script("scripts/margin_experiment.py", [])


def step_int8v():
    run_script("scripts/int8_validate.py", [])


def step_prof64():
    run_script("scripts/profile64.py", [])


def step_celeba_wide_train():
    from defensegan_tpu.cli import train
    train.main(["--cfg", "defensegan_tpu/configs/gans/celeba_wide.yml",
                "--is_train", "--train_iters", "10000",
                "--override", "SAVE_EVERY=5000",
                "--override", "SAMPLE_EVERY=5000"])


def step_celeba_wide_eval():
    # same protocol as the round-2 deep-celeba evaluation (RESULTS.md
    # "64x64 with trained GANs"): FGSM eps=0.3 through the unrolled
    # defense (attack L=25), gender classifier A, 128 tests — the deep
    # row to compare against is clean-def 0.883 / defended 0.820
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba_wide",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "5",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--eval_z0", "both"])


def step_celeba_wide_bench():
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    for kernel in ("xla", "packed"):
        cfg = load_config("output/gans/celeba_wide")
        cfg.projection_kernel = kernel
        gan = DefenseGAN(cfg)
        gan.load()
        v = bench_recon(gan.reconstruct, 256, cfg.image_shape)
        print(json.dumps({"metric": f"celeba_wide_{kernel}",
                          "recon_per_sec": round(v, 2),
                          "rec_rr": cfg.rec_rr,
                          "rec_iters": cfg.rec_iters}), flush=True)


def step_trace():
    # profiler-trace capture through the axon tunnel (SURVEY section 5
    # tracing row): small program, separate step so a tunnel hang costs
    # only this step
    run_script("bench.py", ["--trace", "output/traces/bench",
                            "--deep_cfg", "", "--repeats", "1",
                            "--batch", "4096"])


STEPS = [
    ("bench", step_bench),
    ("v3p_ab", step_v3p_ab),
    ("evalz0_fgsm", step_evalz0_fgsm),
    ("evalz0_cw", step_evalz0_cw),
    ("margin", step_margin),
    ("int8v", step_int8v),
    ("prof64", step_prof64),
    ("celeba_wide_train", step_celeba_wide_train),
    ("celeba_wide_eval", step_celeba_wide_eval),
    ("celeba_wide_bench", step_celeba_wide_bench),
    ("trace", step_trace),
]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue")
