#!/usr/bin/env python
"""Round-5f chip queue: the audit-escalation FAILURE, instrumented.

Round-5e measured P11 and it FAILED: the confident-SPSA advset
tailored to the encoder (2,50) serving point, replayed at the (10,200)
reference point (r5e_escalate_flagship), keeps defended acc 0.000 and
leaks joint undetected (combined) 0.8125 — the audit config's detector
does NOT catch the cheap-tailored set, so the AuditedPipeline cascade
does not bound this attacker by the 0.23 direct-attack ceiling
(expected per-query leak at p=0.1: 0.89*(1-p)+0.81*p ~ 0.89).

Also measured in r5e: P9 FALSIFIED — random-init (2,50) leaks 0.352,
not ~0.9, so the encoder init (not the R*L budget) is the main cause of
the 0.898 operating-point break; and margin-ALONE beats the combined
detector there (AUC 0.938 vs 0.893, joint 0.266 vs 0.352,
scripts/dispersion_analysis.py on flagship_conf_rand2x50.npz).

These legs instrument the two open questions with detstats (the r5e
escalate leg saved none), and redo the P12 digits control that ran
against a wiped (untrained) checkpoint on the fresh machine
(rec_err_clean 0.52 — garbage; retrain first via
`python scripts/round4_queue.py train_digits`).

Pre-registered predictions:
  P13. Dispersion's first real test: at the (10,200) audit point the
       replayed enc-(2,50) set was NOT optimized against the R=10
       restart spread; the 3-feature detector (rec err + margin +
       rel_gap dispersion) beats the combined 0.635 AUC on it. (If it
       does not, the transferred set is genuinely on-manifold
       confidently-wrong and no projection-side statistic will see it.)
  P14. Init-switch mitigation: serving the SAME (2,50) budget with
       random init (what r5e measured for direct attacks: 0.352) also
       degrades the TRANSFERRED enc-tailored set — replay leak at
       (2,50) random lands well under the 0.898 enc figure. Cheap to
       serve (no audit machinery), so if it holds, the serving default
       for the 20x point becomes rec_init=random-or-jitter rather than
       the cascade.
  P12'. Digits control redo on a trained GAN: random-init (2,50)
       confident SPSA on digits leaks ~0.13 (the budget/band, not the
       encoder, explains the digits drop).

Run: python scripts/round5f_queue.py [only_leg ...]   (cwd=/root/repo)
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import queue_lib  # noqa: E402


def _script(path, argv=()):
    queue_lib.run_script(path, list(argv))


RUNNERS = {"script": _script}

ADVSET = "output/advsets/flagship_conf_enc2x50.npz"
FLAGSHIP = ["--cfg", "output/gans/mnist_fast", "--model", "A",
            "--num_tests", "128", "--attack_type", "none",
            "--load_adv", ADVSET, "--detect"]
OP_2X50 = ["--override", "REC_RR=2", "--override", "REC_ITERS=50"]
DIGITS_CONF = ["--cfg", "output/gans/digits", "--model", "A",
               "--attack_type", "spsa", "--num_tests", "128",
               "--attack_batch", "64", "--spsa_iters", "80",
               "--spsa_samples", "64", "--spsa_chunk", "8",
               "--spsa_objective", "confident",
               "--spsa_margin_kappa", "9.67",
               "--spsa_rec_penalty", "6000",
               "--spsa_center_quantiles", "0.45", "0.55", "--detect"]

LEGS = [
    # P13: the audit point, instrumented (all_losses [N,10] for the
    # dispersion feature).
    {"name": "r5f_escalate_detsave", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP + [
         "--detect_save", "output/detstats/flagship_conf_enc2x50_at10x200.npz"]},
    # P14: same cheap budget, random init, transferred set.
    {"name": "r5f_escalate_rand2x50", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP + OP_2X50 + [
         "--detect_save", "output/detstats/flagship_conf_enc2x50_at_rand2x50.npz"]},
    # P12': digits control on a TRAINED checkpoint.
    {"name": "r5f_conf_digits_rand2x50", "run": "script", "path": "whitebox.py",
     "argv": DIGITS_CONF + OP_2X50 + [
         "--detect_save", "output/detstats/digits_conf_rand2x50.npz"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5f")
