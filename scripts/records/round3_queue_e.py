#!/usr/bin/env python
"""Round-3 chip queue E: stochasticity split on REAL data + the
reference-depth config.

The eval_z0 decomposition (CW defended 1.000 fresh vs 0.684 attack-z0)
was measured on the wide flagship with synthetic data; these cells
extend it to (a) real handwriting (digits — the one real image set
reachable offline) and (b) the reference-faithful deep/dim64 MNIST
topology, so the restart-stochasticity claim doesn't rest on one
generator or one data family.

Run: python scripts/round3_queue_e.py
"""

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import run_steps  # noqa: E402


def _wb(cfg_dir, attack, extra=()):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", cfg_dir,
                   "--attack_type", attack, "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", "128",
                   "--eval_z0", "both"] + list(extra))


CW = ("--cw_max_iterations", "200", "--cw_binary_search_steps", "4",
      "--cw_abort_early", "--cw_chunk_iters", "25")


def step_digits_fgsm():
    # eps=0.1: the regime where the defense partially holds on digits
    # (round-1 table) — the interesting cell for the stochasticity split
    _wb("output/gans/digits", "fgsm", ("--fgsm_eps", "0.1"))


def step_digits_cw():
    _wb("output/gans/digits", "cw", CW)


def step_deep_fgsm():
    _wb("output/gans/mnist", "fgsm")


def step_deep_cw():
    _wb("output/gans/mnist", "cw", CW)


STEPS = [("digits_fgsm", step_digits_fgsm), ("digits_cw", step_digits_cw),
         ("deep_fgsm", step_deep_fgsm), ("deep_cw", step_deep_cw)]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue E")
