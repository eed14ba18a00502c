#!/usr/bin/env python
"""Round-3 chip queue U: two-sided + joint detection stats for the
paper-era attacks.

Queues O/Q measured one-sided detection (FGSM AUC 1.000 everywhere; CW
leaks 0.69-0.83). whitebox/blackbox --detect now also emit the two-sided
statistic (|err - clean median|) and the joint two-layer number
undetected_success_rate = P(misclassified through the defense AND
unflagged at 5% FPR). Re-run the same cells so the defense-in-depth
matrix (RESULTS.md) carries the operational metric for every attack:
  - whitebox FGSM/CW on digits + flagship, FGSM on f-mnist and
    celeba_wide (the queue O/Q grid), and
  - blackbox (Jacobian-substitute FGSM transfer) on digits — the
    transfer-attack detection row the reference pipeline never had.
Questions: does CW's 0.69-0.83 one-sided AUC drop under the two-sided
statistic (CW errors sit just above clean — distance-from-median halves
the margin for examples near the center)? And is any paper-era attack's
joint undetected-success materially above 0?

Final steps exercise the SERVING surface: the digits whitebox cells save
their adversarial sets (--save_adv), four attack classes (FGSM, CW,
EOT-PGD, detection-aware PGD lambda=30) then run through the calibrated
DefendedPipeline (scripts/pipeline_exp.py) — flag rate, accuracy on
unflagged, undetected-success, per set.

Run: python scripts/round3_queue_u.py  (cwd=/root/repo)
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


def step_d2_digits_fgsm():
    _wb("output/gans/digits", "fgsm",
        ("--fgsm_eps", "0.1", "--save_adv", "output/advsets/digits_fgsm.npz",
         "--detect_save", "output/detstats/digits_fgsm.npz"))


def step_d2_digits_cw():
    _wb("output/gans/digits", "cw",
        CW + ("--save_adv", "output/advsets/digits_cw.npz",
              "--detect_save", "output/detstats/digits_cw.npz"))


def _pgd_digits_save(lam, path):
    _wb("output/gans/digits", "pgd",
        ("--fgsm_eps", "0.1", "--pgd_iters", "40", "--pgd_eps_iter", "0.01",
         "--attack_grad", "bpda", "--pgd_rec_penalty", str(lam),
         "--save_adv", path,
         "--detect_save",
         f"output/detstats/digits_pgd_l{lam:g}.npz"))


def step_d2_digits_pgd0():
    _pgd_digits_save(0, "output/advsets/digits_pgd.npz")


def step_d2_digits_pgd30():
    _pgd_digits_save(30, "output/advsets/digits_pgd_pen30.npz")


def step_pipeline_digits():
    # serving-surface evaluation over the four saved sets
    import pipeline_exp
    pipeline_exp.main(["--cfg", "output/gans/digits",
                       "--model", "A", "--sets",
                       "output/advsets/digits_fgsm.npz",
                       "output/advsets/digits_cw.npz",
                       "output/advsets/digits_pgd.npz",
                       "output/advsets/digits_pgd_pen30.npz"])


def step_d2_flagship_fgsm():
    _wb("output/gans/mnist_fast", "fgsm",
        ("--detect_save", "output/detstats/flagship_fgsm.npz"),
        batch="256")


def step_d2_flagship_cw():
    _wb("output/gans/mnist_fast", "cw",
        CW + ("--detect_save", "output/detstats/flagship_cw.npz"),
        batch="256")


def step_d2_digits_rand_fgsm():
    _wb("output/gans/digits", "rand_fgsm", ("--fgsm_eps", "0.1"))


def step_d2_flagship_rand_fgsm():
    _wb("output/gans/mnist_fast", "rand_fgsm", batch="256")


def step_d2_fmnist_fgsm():
    _wb("output/gans/f-mnist", "fgsm")


def step_d2_celeba_wide_fgsm():
    # queue Q settings (64x64: shallower attack graph, smaller n)
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba_wide",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "5",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--detect"])


def step_d2_blackbox_digits():
    from defensegan_tpu.cli import blackbox
    blackbox.main(["--cfg", "output/gans/digits",
                   "--bb_model", "A", "--sub_model", "B",
                   "--fgsm_eps", "0.1", "--num_tests", "256",
                   "--classifier_epochs", "10", "--detect"])


STEPS = [
    ("d2_digits_fgsm", step_d2_digits_fgsm),
    ("d2_digits_cw", step_d2_digits_cw),
    ("d2_digits_pgd0", step_d2_digits_pgd0),
    ("d2_digits_pgd30", step_d2_digits_pgd30),
    ("d2_flagship_fgsm", step_d2_flagship_fgsm),
    ("d2_flagship_cw", step_d2_flagship_cw),
    ("d2_digits_rand_fgsm", step_d2_digits_rand_fgsm),
    ("d2_flagship_rand_fgsm", step_d2_flagship_rand_fgsm),
    ("d2_fmnist_fgsm", step_d2_fmnist_fgsm),
    ("d2_celeba_wide_fgsm", step_d2_celeba_wide_fgsm),
    ("d2_blackbox_digits", step_d2_blackbox_digits),
    ("pipeline_digits", step_pipeline_digits),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue U")
