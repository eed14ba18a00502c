#!/usr/bin/env python
"""Round-3 chip queue O: attack-detection AUC on trained checkpoints.

whitebox --detect (new: eval/detect.py) thresholds the final projection
loss ||G(z*) - x||^2 as an adversarial-input detector (paper section
5.1). These steps measure the ROC AUC + detection rate @ 5% FPR on the
three trained model families available offline: real digits, the wide
flagship (synthetic MNIST), and the reference-faithful deep f-mnist —
under both FGSM (paper's detection setting) and CW (the low-distortion
attack detection should find HARDER: CW minimizes exactly the kind of
excursion the detector measures).

Run: python scripts/round3_queue_o.py  (cwd=/root/repo)
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

CW = ("--cw_max_iterations", "200", "--cw_binary_search_steps", "4",
      "--cw_abort_early", "--cw_chunk_iters", "25")


def _wb(cfg_dir, attack, extra=(), batch="128"):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", cfg_dir,
                   "--attack_type", attack, "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", batch,
                   "--detect"] + list(extra))


def step_detect_digits_fgsm():
    _wb("output/gans/digits", "fgsm", ("--fgsm_eps", "0.1"))


def step_detect_digits_cw():
    _wb("output/gans/digits", "cw", CW)


def step_detect_flagship_fgsm():
    _wb("output/gans/mnist_fast", "fgsm", batch="256")


def step_detect_flagship_cw():
    _wb("output/gans/mnist_fast", "cw", CW, batch="256")


def step_detect_fmnist_fgsm():
    _wb("output/gans/f-mnist", "fgsm")


STEPS = [
    ("detect_digits_fgsm", step_detect_digits_fgsm),
    ("detect_digits_cw", step_detect_digits_cw),
    ("detect_flagship_fgsm", step_detect_flagship_fgsm),
    ("detect_flagship_cw", step_detect_flagship_cw),
    ("detect_fmnist_fgsm", step_detect_fmnist_fgsm),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue O")
