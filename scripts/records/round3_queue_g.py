#!/usr/bin/env python
"""Round-3 chip queue G: GAN-learnable watermark + fmnist exact replay.

Two follow-ups from the queue-E/F results:

1. restore_smooth_*: the collapse-and-restore experiment's restore
   magnitude fell with watermark amplitude (0.934 -> 0.500) because the
   salt watermark is iid pixel noise — the feature family a DCGAN
   generator reproduces WORST. scripts/restore_exp.py now has a "smooth"
   style (low-frequency per-class blob fields): equally discriminative,
   equally flippable inside the eps ball, but exactly what deconv
   generators learn best. Prediction (RESULTS.md collapse section): same
   bare-classifier collapse, much higher defended restore. Either
   outcome is informative — a high restore completes the paper-signature
   reproduction (restore magnitude is governed by GAN-learnability of
   the small-margin feature); a low restore would falsify that reading.

2. fix_fmnist_cw: the fmnist_fast eval_z0 row (CW attack-z0 0.727) was
   measured before whitebox pinned the attack-z0 replay to the attack
   graph's numeric path (rec_kernel="xla"); re-measure under the exact
   replay like queue F did for the other configs.

Run: python scripts/round3_queue_g.py   (cwd=/root/repo; script may live
in a /tmp snapshot — queue_lib resolves ROOT from its own location).
"""

import sys
import os

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import run_script, run_steps  # noqa: E402


def _restore(wm_amp):
    run_script("scripts/restore_exp.py",
               ["12", wm_amp, "10000", "smooth"])


def step_restore_smooth_w04():
    _restore("0.4")


def step_restore_smooth_w03():
    _restore("0.3")


def step_restore_smooth_w02():
    _restore("0.2")


def step_fix_fmnist_cw():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/fmnist_fast",
                   "--attack_type", "cw", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", "256",
                   "--eval_z0", "both",
                   "--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4",
                   "--cw_abort_early", "--cw_chunk_iters", "25"])


STEPS = [
    ("restore_smooth_w04", step_restore_smooth_w04),
    ("restore_smooth_w03", step_restore_smooth_w03),
    ("restore_smooth_w02", step_restore_smooth_w02),
    ("fix_fmnist_cw", step_fix_fmnist_cw),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue G")
