#!/usr/bin/env python
"""Round-3 chip queue V: the centered-penalty counter-attack vs the
two-sided detector.

Queue S: penalizing raw rec error evades the one-sided detector but
overshoots (flagship rec err 100x BELOW clean) — exactly what the
two-sided statistic |rec - clean median| catches (queue T measures
that). The attacker's counter (--pgd_rec_center, compose.py): penalize
(rec - c)^2 with c = the clean median, steering the statistic TO the
center. This queue sweeps lambda for that attack on both targets and
runs the digits set through the serving pipeline.

Lambda scales (from queue S deltas): the centered penalty is quadratic
in the deviation, so lambda must be ~1/delta^2 to register against an
O(1) xent — digits delta ~0.007 => lambda ~1e3-1e5; flagship delta
~0.09 => lambda ~30-1000. Centers: clean means from queue S (digits
0.0017, flagship 0.033; the attacker estimates these from data, and the
penalty is flat near its minimum, so mean-vs-median slack is immaterial).

Run: python scripts/round3_queue_v.py  (cwd=/root/repo)
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


def _cen(cfg, eps, batch, lam, center, save=None):
    from defensegan_tpu.cli import whitebox
    argv = ["--cfg", cfg,
            "--attack_type", "pgd", "--defense_type", "defense_gan",
            "--model", "A", "--num_tests", "256",
            "--classifier_epochs", "10",
            "--fgsm_eps", eps, "--pgd_iters", "40",
            "--pgd_eps_iter", "0.01",
            "--attack_rec_iters", "200", "--attack_batch", batch,
            "--attack_grad", "bpda",
            "--pgd_rec_penalty", str(lam),
            "--pgd_rec_center", str(center), "--detect"]
    if save:
        argv += ["--save_adv", save]
    whitebox.main(argv)


def _mk_digits(lam, save=None):
    return lambda: _cen("output/gans/digits", "0.1", "128", lam, 0.0017,
                        save)


def _mk_flagship(lam):
    return lambda: _cen("output/gans/mnist_fast", "0.3", "256", lam, 0.033)


def step_pipeline_digits_centered():
    import pipeline_exp
    pipeline_exp.main(["--cfg", "output/gans/digits",
                       "--model", "A", "--sets",
                       "output/advsets/digits_pgd_cen.npz"])


STEPS = (
    [(f"cen_digits_l{lam:g}", _mk_digits(lam)) for lam in (1e3, 1e5)]
    + [("cen_digits_l1e4",
        _mk_digits(1e4, save="output/advsets/digits_pgd_cen.npz"))]
    + [(f"cen_flagship_l{lam:g}", _mk_flagship(lam))
       for lam in (30, 100, 1000)]
    + [("pipeline_digits_centered", step_pipeline_digits_centered)]
)


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue V")
