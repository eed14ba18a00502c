#!/usr/bin/env python
"""Round-3 chip queue D: f-mnist fast operating point.

Completes the wide-flagship story across the MNIST family: train
fmnist_fast.yml (wide/dim16 — identical topology to the MNIST flagship,
so throughput is the already-measured 3763/5761 recon/s) and run the
quality-equivalence protocol against the reference-depth f-mnist GAN at
matched 20k steps: clean-defended + FGSM/CW defended, eval_z0 both.

Same discipline as round3_queue.py. Run: python scripts/round3_queue_d.py
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

from queue_lib import QDIR, run_script, run_steps  # noqa: E402,F401

def step_train():
    from defensegan_tpu.cli import train
    train.main(["--cfg", "defensegan_tpu/configs/gans/fmnist_fast.yml",
                "--is_train", "--train_iters", "20000",
                "--override", "SAVE_EVERY=10000",
                "--override", "SAMPLE_EVERY=10000"])


def _wb(extra):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/fmnist_fast",
                   "--defense_type", "defense_gan", "--model", "A",
                   "--num_tests", "256", "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", "256",
                   "--eval_z0", "both"] + extra)


def step_eval_fgsm():
    _wb(["--attack_type", "fgsm"])


def step_eval_cw():
    _wb(["--attack_type", "cw", "--cw_max_iterations", "200",
         "--cw_binary_search_steps", "4", "--cw_abort_early",
         "--cw_chunk_iters", "25"])


STEPS = [("fmf_train", step_train), ("fmf_fgsm", step_eval_fgsm),
         ("fmf_cw", step_eval_cw)]


if __name__ == "__main__":
    run_steps(STEPS, sys.argv[1:], label="queue D")
