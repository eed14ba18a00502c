#!/usr/bin/env python
"""Round-3 chip queue T: the penalty frontier under the TWO-SIDED
detector + joint two-layer metric.

Queue S showed (one-sided detector): digits gives back most damage to
duck under detection (defended 0.42 -> 0.76-0.82); the flagship frontier
is a step (lambda=0: defended 0.000 / AUC 1.000; lambda=3: the penalty
turns PGD into a manifold projector, rec err 100x BELOW clean, one-sided
AUC 0.000 — i.e. undetectable only because the detector is one-sided).
whitebox --detect now also emits the two-sided statistic
(|err - clean median|) and undetected_success_rate (P(misclassified AND
unflagged at 5% FPR)). Queue T:
  - re-measures the queue S/R endpoints to get the new fields
    (lambda=0 both targets; digits 30/300; flagship 3), and
  - fills the frontier gaps: flagship lambda in {0.3, 1} (between the
    0 and 3 step), digits lambda in {3, 10} (low end).
Prediction to test: the two-sided detector closes the flagship
lambda>=3 escape entirely, and on digits the attacker's best joint
undetected-success stays far below the lambda=0 misclassification rate.

Run: python scripts/round3_queue_t.py  (cwd=/root/repo)
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


def _pen(cfg, eps, batch, lam):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", cfg,
                   "--attack_type", "pgd", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--fgsm_eps", eps, "--pgd_iters", "40",
                   "--pgd_eps_iter", "0.01",
                   "--attack_rec_iters", "200", "--attack_batch", batch,
                   "--attack_grad", "bpda",
                   "--pgd_rec_penalty", str(lam), "--detect"])


def _mk_flagship(lam):
    return lambda: _pen("output/gans/mnist_fast", "0.3", "256", lam)


def _mk_digits(lam):
    return lambda: _pen("output/gans/digits", "0.1", "128", lam)


STEPS = (
    [(f"pen2_flagship_l{lam}", _mk_flagship(lam))
     for lam in (0, 0.3, 1, 3)]
    + [(f"pen2_digits_l{lam}", _mk_digits(lam))
       for lam in (0, 3, 10, 30, 300)]
)


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue T")
