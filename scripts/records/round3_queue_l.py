#!/usr/bin/env python
"""Round-3 chip queue L: the digits R=1/L=25 operating point under
attacks that TARGET it.

The R x L ablation (queue J) found digits FGSM-defended accuracy is
best at the weakest projection (R=1, L=25: 0.621 vs 0.504 at the paper
defaults) — but the ablation held the adversarial set fixed
(bare-graph FGSM). A deployable operating-point claim needs the
attacker to target the deployed defense: craft FGSM and CW through the
unrolled R=1/L=25 graph and evaluate at R=1/L=25 with the eval_z0
split. Baselines (paper-default defense, queue F): FGSM
0.500/0.531/0.523, CW 0.641/0.832/0.707.

Run: python scripts/round3_queue_l.py  (cwd=/root/repo)
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


def _wb(attack, extra=()):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/digits",
                   "--attack_type", attack, "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--rec_rr", "1", "--rec_iters", "25",
                   "--attack_rec_iters", "25", "--attack_batch", "128",
                   "--eval_z0", "both"] + list(extra))


def step_op_digits_fgsm():
    _wb("fgsm", ("--fgsm_eps", "0.1"))


def step_op_digits_cw():
    _wb("cw", ("--cw_max_iterations", "200", "--cw_binary_search_steps", "4",
               "--cw_abort_early", "--cw_chunk_iters", "25"))


STEPS = [
    ("op_digits_fgsm", step_op_digits_fgsm),
    ("op_digits_cw", step_op_digits_cw),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue L")
