#!/usr/bin/env python
"""Round-3 chip queue R: is the adaptive attack DETECTABLE?

Queue Q measured the Athalye et al. adaptive attack (EOT-PGD with
BPDA/exact gradients) beating purification everywhere: digits defended
falls to 0.39-0.43 (vs FGSM 0.555 / CW 0.867) and the wide flagship to
0.000 (vs CW 1.000). The defense-in-depth question that decides the
serving story: does the rec-error detector (AUC 1.000 on FGSM at the
same eps on every family) still flag EOT-PGD inputs? PGD spends its
whole L_inf budget, so — unlike CW, which minimizes exactly the
off-manifold excursion the detector thresholds — it should remain
detectable. Measure, don't assume: the same cells as queue Q's EOT
legs, with --detect, plus the deep/dim64 family (f-mnist) for
family coverage.

Run: python scripts/round3_queue_r.py  (cwd=/root/repo)
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


def _pgd_detect(cfg, grad, eps, batch):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", cfg,
                   "--attack_type", "pgd", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--fgsm_eps", eps, "--pgd_iters", "40",
                   "--pgd_eps_iter", "0.01",
                   "--attack_rec_iters", "200", "--attack_batch", batch,
                   "--attack_grad", grad, "--detect"])


def step_detect_pgd_digits_bpda():
    _pgd_detect("output/gans/digits", "bpda", "0.1", "128")


def step_detect_pgd_digits_exact():
    _pgd_detect("output/gans/digits", "exact", "0.1", "128")


def step_detect_pgd_flagship_bpda():
    _pgd_detect("output/gans/mnist_fast", "bpda", "0.3", "256")


def step_detect_pgd_flagship_exact():
    _pgd_detect("output/gans/mnist_fast", "exact", "0.3", "256")


def step_detect_pgd_fmnist_bpda():
    _pgd_detect("output/gans/f-mnist", "bpda", "0.3", "128")


STEPS = [
    ("detect_pgd_digits_bpda", step_detect_pgd_digits_bpda),
    ("detect_pgd_digits_exact", step_detect_pgd_digits_exact),
    ("detect_pgd_flagship_bpda", step_detect_pgd_flagship_bpda),
    ("detect_pgd_flagship_exact", step_detect_pgd_flagship_exact),
    ("detect_pgd_fmnist_bpda", step_detect_pgd_fmnist_bpda),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue R")
