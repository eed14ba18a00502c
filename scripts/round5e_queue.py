#!/usr/bin/env python
"""Round-5e chip queue: disentangle the operating-point detector break.

Round-5c measured the serving operating point (rec_init=encoder, R=2,
L=50) against the round-5 suite's strongest attacks and P6 FAILED on
the flagship: confident SPSA (kappa=31.65, lam=300, per-image centers
at clean quantiles 0.45-0.55) reaches joint undetected (combined) 0.898
vs 0.227-0.266 at the reference (10,200) point. Mechanism on the row:
the cheap projection barely resists "confidently wrong" — purified adv
margin 27.3 vs clean 32.5 (at (10,200) the purifier held it to 18.7 vs
target 31.65), so the margin feature's separation collapses (combined
AUC 0.55). Three confounders changed at once vs the (10,200) cells:
the R*L budget, the encoder init, and the center band (0.45-0.55
self-calibrated vs the fixed 0.033 / wide 0.05-0.95 dispersed). These
legs split them, and measure the one cheap mitigation the design
admits (cross-config escalation).

Pre-registered predictions:
  P9.  Budget, not init: confident SPSA vs RANDOM-init (2,50) leaks in
       the same ~0.9 band as encoder (2,50) — the purifier's
       resistance to "confidently wrong" is an R*L effect, encoder-init
       is innocent.
  P10. Band is not the cause: confident SPSA vs (10,200) random with
       the same 0.45-0.55 band stays in the known 0.22-0.27 band.
  P11. Escalation works: the advset tailored to encoder (2,50),
       re-evaluated at the (10,200) reference point (--load_adv, zero
       re-craft), either loses its success (defended acc recovers
       toward 1.0) or is flagged (combined AUC -> ~1.0); joint
       undetected <= 0.05. That would make "serve cheap, audit
       expensive at random" a measured mitigation: the attacker who
       also wants to beat a p-probability (10,200) audit inherits that
       config's 0.23 ceiling on the audited fraction.
  P12. Digits went DOWN at the operating point (0.219 -> 0.133): if
       the random-init (2,50) digits cell leaks ~0.13 too, the drop is
       the budget/band, not the encoder's tighter clean rec-err.

Run: python scripts/round5e_queue.py [only_leg ...]   (cwd=/root/repo)
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

OP_2X50 = ["--override", "REC_RR=2", "--override", "REC_ITERS=50"]
ENC = ["--override", "REC_INIT=encoder"]
FLAGSHIP_CONF = ["--cfg", "output/gans/mnist_fast", "--model", "A",
                 "--attack_type", "spsa", "--num_tests", "128",
                 "--attack_batch", "64", "--spsa_iters", "80",
                 "--spsa_samples", "64", "--spsa_chunk", "8",
                 "--spsa_objective", "confident",
                 "--spsa_margin_kappa", "31.65",
                 "--spsa_rec_penalty", "300",
                 "--spsa_center_quantiles", "0.45", "0.55", "--detect"]
DIGITS_CONF = ["--cfg", "output/gans/digits", "--model", "A",
               "--attack_type", "spsa", "--num_tests", "128",
               "--attack_batch", "64", "--spsa_iters", "80",
               "--spsa_samples", "64", "--spsa_chunk", "8",
               "--spsa_objective", "confident",
               "--spsa_margin_kappa", "9.67",
               "--spsa_rec_penalty", "6000",
               "--spsa_center_quantiles", "0.45", "0.55", "--detect"]

ADVSET = "output/advsets/flagship_conf_enc2x50.npz"

LEGS = [
    # P9: same operating point, random init.
    {"name": "r5e_conf_flagship_rand2x50", "run": "script",
     "path": "whitebox.py", "argv": FLAGSHIP_CONF + OP_2X50 + [
         "--detect_save", "output/detstats/flagship_conf_rand2x50.npz"]},
    # P10: reference point, new band.
    {"name": "r5e_conf_flagship_10x200_band", "run": "script",
     "path": "whitebox.py", "argv": FLAGSHIP_CONF},
    # P12: digits control at the operating point, random init.
    {"name": "r5e_conf_digits_rand2x50", "run": "script",
     "path": "whitebox.py", "argv": DIGITS_CONF + OP_2X50},
    # P11a: re-craft the r5c flagship cell saving the advset (seed-0
    # deterministic; reproduces the committed 0.898 row's set).
    {"name": "r5e_conf_flagship_enc_saveadv", "run": "script",
     "path": "whitebox.py",
     "argv": FLAGSHIP_CONF + OP_2X50 + ENC + ["--save_adv", ADVSET]},
    # P11b: evaluate that set at the (10,200) reference point.
    {"name": "r5e_escalate_flagship", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "none", "--num_tests", "128",
              "--load_adv", ADVSET, "--detect"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5e")
