#!/usr/bin/env python
"""Round-3 chip queue F: re-measure the eval_z0 attack-z0 legs under the
pinned-kernel replay.

The self-review found that --eval_z0 both's attack-z0 leg let
projection_kernel=auto resolve to the bf16 Pallas kernel while the attack
graph had differentiated through the generic f32 XLA path — so the
"attacker's exact z0" eval followed a numerically different trajectory
than the one the attacker optimized against, and the measured
fresh-vs-attack gap mixed kernel numerics into the stochasticity story.
whitebox now pins that leg to rec_kernel="xla" (same numerics as the
attack graph); these steps re-measure every eval_z0 row in RESULTS.md
under the fix. Fresh-leg numbers should reproduce; attack-z0 numbers are
expected to DROP (the replay is now exact, so the attack is at full
strength against it).

Run: python scripts/round3_queue_f.py
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


def _wb(cfg_dir, attack, extra=(), batch="128"):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", cfg_dir,
                   "--attack_type", attack, "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", batch,
                   "--eval_z0", "both"] + list(extra))


CW = ("--cw_max_iterations", "200", "--cw_binary_search_steps", "4",
      "--cw_abort_early", "--cw_chunk_iters", "25")


def step_fix_flagship_fgsm():
    _wb("output/gans/mnist_fast", "fgsm", batch="256")


def step_fix_flagship_cw():
    _wb("output/gans/mnist_fast", "cw", CW, batch="256")


def step_fix_digits_fgsm():
    _wb("output/gans/digits", "fgsm", ("--fgsm_eps", "0.1"))


def step_fix_digits_cw():
    _wb("output/gans/digits", "cw", CW)


def step_fix_deep_fgsm():
    _wb("output/gans/mnist", "fgsm")


def step_fix_deep_cw():
    _wb("output/gans/mnist", "cw", CW)


def step_fix_celeba_wide():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba_wide",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "5",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--eval_z0", "both"])


STEPS = [("fix_flagship_fgsm", step_fix_flagship_fgsm),
         ("fix_flagship_cw", step_fix_flagship_cw),
         ("fix_digits_fgsm", step_fix_digits_fgsm),
         ("fix_digits_cw", step_fix_digits_cw),
         ("fix_deep_fgsm", step_fix_deep_fgsm),
         ("fix_deep_cw", step_fix_deep_cw),
         ("fix_celeba_wide", step_fix_celeba_wide)]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue F")
