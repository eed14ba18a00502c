#!/usr/bin/env python
"""Round-3 chip queue P: operating-point + detection follow-ups.

1. tor_digits_fgsm_r1_l200 — queue L measured the TARGETED FGSM
   operating point at R=1/L=25 (0.656 defended); queue N2 showed the CW
   replay collapse there was the L=25 depth effect. This step measures
   targeted FGSM at R=1/L=200: does FGSM also prefer the deep
   projection once the replay-amplification failure is removed, or does
   the R x L ablation's "FGSM-defended falls with L" hold under a
   targeted attack too? Completes the digits operating-point table.
2. detect_digits_fgsm_bare — detection (rec-error AUC) of FGSM crafted
   on the BARE classifier graph (attack unaware of the defense, the
   transfer setting): expected easier to detect than the through-defense
   attack, which can trade classification damage for manifold proximity.
3. detect_celeba_wide_fgsm — detection at 64x64 (celeba_wide flagship).

Run: python scripts/round3_queue_p.py  (cwd=/root/repo)
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


def step_tor_digits_fgsm_r1_l200():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/digits",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--fgsm_eps", "0.1",
                   "--rec_rr", "1", "--rec_iters", "200",
                   "--attack_rec_iters", "200", "--attack_batch", "128",
                   "--eval_z0", "both"])


def step_detect_digits_fgsm_bare():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/digits",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--fgsm_eps", "0.1",
                   "--attack_through_defense", "no",
                   "--attack_batch", "128", "--detect"])


def step_detect_celeba_wide_fgsm():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba_wide",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "5",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--detect"])


STEPS = [
    ("tor_digits_fgsm_r1_l200", step_tor_digits_fgsm_r1_l200),
    ("detect_digits_fgsm_bare", step_detect_digits_fgsm_bare),
    ("detect_celeba_wide_fgsm", step_detect_celeba_wide_fgsm),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue P")
