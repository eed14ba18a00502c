#!/usr/bin/env python
"""Round-3 chip queue Q: 64x64 detection (dropped from queue P) + the
PGD/BPDA adaptive-attack grid on trained checkpoints.

1. detect_celeba_wide_fgsm — queue P's third step (session died before
   it ran): detection at 64x64 (celeba_wide flagship).
2-5. pgd_digits_{bpda,exact}_{eot,fixed} — the Athalye et al. 2018
   adaptive-attack evaluation the reference never ran, on real digits:
   grad in {bpda (straight-through), exact (unrolled L=200)} x z0 in
   {per_step (EOT: fresh restarts every PGD step — attacks the
   stochastic defense itself), fixed (one pinned defense instance,
   measured under the exact replay leg --eval_z0 both)}.
   Questions: (a) does EOT-PGD beat the paper-era attacks (digits FGSM
   exact-grad defended = 0.555, CW fresh-z0 = 0.867)? (b) how much
   attack strength does the cheap BPDA gradient give up vs exact?
   (c) fixed-z0 cells: is PGD's replay margin like CW's (fresh >>
   replay)?
6-7. pgd_flagship_{bpda,exact}_eot — same EOT attack on the wide
   flagship (mnist_fast), where CW-defended measured 1.000 under fresh
   z0: can EOT break the stochastic wall that CW could not?

PGD settings: Madry et al. MNIST evaluation (40 steps, eps_iter 0.01,
random init) at the families' standard eps (digits 0.1, mnist 0.3).

Run: python scripts/round3_queue_q.py  (cwd=/root/repo)
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


def step_detect_celeba_wide_fgsm():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba_wide",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "5",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--detect"])


def _pgd_digits(grad, z0):
    from defensegan_tpu.cli import whitebox
    argv = ["--cfg", "output/gans/digits",
            "--attack_type", "pgd", "--defense_type", "defense_gan",
            "--model", "A", "--num_tests", "256",
            "--classifier_epochs", "10",
            "--fgsm_eps", "0.1", "--pgd_iters", "40",
            "--pgd_eps_iter", "0.01",
            "--attack_rec_iters", "200", "--attack_batch", "128",
            "--attack_grad", grad, "--pgd_z0", z0]
    if z0 == "fixed":
        argv += ["--eval_z0", "both"]
    whitebox.main(argv)


def step_pgd_digits_bpda_eot():
    _pgd_digits("bpda", "per_step")


def step_pgd_digits_exact_eot():
    _pgd_digits("exact", "per_step")


def step_pgd_digits_bpda_fixed():
    _pgd_digits("bpda", "fixed")


def step_pgd_digits_exact_fixed():
    _pgd_digits("exact", "fixed")


def _pgd_flagship(grad):
    from defensegan_tpu.cli import whitebox
    argv = ["--cfg", "output/gans/mnist_fast",
            "--attack_type", "pgd", "--defense_type", "defense_gan",
            "--model", "A", "--num_tests", "256",
            "--classifier_epochs", "10",
            "--fgsm_eps", "0.3", "--pgd_iters", "40",
            "--pgd_eps_iter", "0.01",
            "--attack_rec_iters", "200", "--attack_batch", "256",
            "--attack_grad", grad]
    if grad == "exact":
        # one exact-grad step through the unrolled L=200 graph at batch
        # 256 runs tens of seconds — keep each device program well under
        # the TPU watchdog
        argv += ["--pgd_chunk_iters", "2"]
    whitebox.main(argv)


def step_pgd_flagship_bpda_eot():
    _pgd_flagship("bpda")


def step_pgd_flagship_exact_eot():
    _pgd_flagship("exact")


STEPS = [
    ("detect_celeba_wide_fgsm", step_detect_celeba_wide_fgsm),
    ("pgd_digits_bpda_eot", step_pgd_digits_bpda_eot),
    ("pgd_digits_exact_eot", step_pgd_digits_exact_eot),
    ("pgd_digits_bpda_fixed", step_pgd_digits_bpda_fixed),
    ("pgd_digits_exact_fixed", step_pgd_digits_exact_fixed),
    ("pgd_flagship_bpda_eot", step_pgd_flagship_bpda_eot),
    ("pgd_flagship_exact_eot", step_pgd_flagship_exact_eot),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue Q")
