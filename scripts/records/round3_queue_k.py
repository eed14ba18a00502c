#!/usr/bin/env python
"""Round-3 chip queue K: --train_on_recs measured on real data.

The reference's defense-aware classifier training (whitebox.py
--train_on_recs / --online_training: train the classifier on
Defense-GAN reconstructions of the training set, so it sees the
defense's output distribution at train time) has been shipped and
tested since round 1 but never measured end-to-end on real data — 0 of
241 whitebox.jsonl rows have train_on_recs=true. These steps run it on
real digits; compare against the queue-F baselines (same protocol,
vanilla classifier): FGSM 0.500/0.531/0.523, CW 0.641/0.832/0.707
(bare / defended fresh / defended attack-z0).

Run: python scripts/round3_queue_k.py  (cwd=/root/repo)
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
                   "--classifier_epochs", "10", "--train_on_recs",
                   "--attack_rec_iters", "200", "--attack_batch", "128",
                   "--eval_z0", "both"] + list(extra))


def step_tor_digits_fgsm():
    _wb("fgsm", ("--fgsm_eps", "0.1"))


def step_tor_digits_cw():
    _wb("cw", ("--cw_max_iterations", "200", "--cw_binary_search_steps", "4",
               "--cw_abort_early", "--cw_chunk_iters", "25"))


STEPS = [
    ("tor_digits_fgsm", step_tor_digits_fgsm),
    ("tor_digits_cw", step_tor_digits_cw),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue K")
