#!/usr/bin/env python
"""Round-3 chip queue S: the detection-aware penalty sweep.

Queues Q/R established the split: EOT-PGD beats purification (flagship
defended 0.000, digits 0.39-0.43) but is PERFECTLY detected (AUC 1.000
everywhere) — while CW evades detection (0.69-0.83 AUC) but not
purification. The remaining question is whether an attacker can beat
BOTH AT ONCE: PGD with objective xent - lambda * rec_loss
(--pgd_rec_penalty; rec_loss is the detector's exact statistic) sweeps
the classification-damage-vs-detectability tradeoff. For each lambda,
record (defended_acc, detection AUC, rec_err_adv).

Scales: flagship clean rec err 0.033 vs PGD-adv 0.122; digits 0.0017 vs
0.009 — lambda must be larger on digits for the penalty to register
against an O(1) xent. BPDA gradients throughout (queue Q: within ~3
points of exact at half cost; the penalty's straight-through gradient is
exact in the t_hat-constant sense).

Run: python scripts/round3_queue_s.py  (cwd=/root/repo)
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
    [(f"pen_flagship_l{lam}", _mk_flagship(lam))
     for lam in (3, 10, 30, 100)]
    + [(f"pen_digits_l{lam}", _mk_digits(lam))
       for lam in (30, 100, 300)]
)


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue S")
