#!/usr/bin/env python
"""Round-5g chip queue: does the encoder-init break REPLICATE beyond
MNIST?

Round-5e/5f localized the flagship operating-point break to the
encoder init (P9) and measured that the resulting confident-SPSA set
transfers to every operating point (P11/P13 — detectors blind) with
random-init serving as the only partial mitigation (P14, 0.438 via
center overfit). The natural question for the end-state ledger is
whether that is an MNIST artifact or a property of rich-content
datasets generally; digits (tight 8x8 manifold) resists, f-mnist is
the in-tree rich-content control with a trained deep GAN
(output/gans/f-mnist) and known clean statistics
(output/detstats/fmnist_spsa.npz: clean margin median 32.56, clean rec
err median 0.0317 — same scale as the flagship, so kappa=32.56 and
lam=300 carry over).

Pre-registered predictions:
  P15. The break replicates: confident SPSA (kappa=32.56, lam=300,
       centers at clean quantiles 0.45-0.55) at the f-mnist encoder
       (2,50) point leaks >=0.6 joint undetected (combined) — the
       near-identity cheap purifier fails to resist confidently-wrong
       on rich content, as on MNIST (0.898).
  P16. The transfer replicates: the enc-(2,50) f-mnist set, replayed
       at (10,200) random, keeps a majority of its undetected leak
       (>=0.4) — on-manifold confidently-wrong images transfer across
       operating points on dataset #2 as well.
  Control: the direct (10,200) random confident cell should land in a
       band like the flagship's 0.22-0.35 (the strong purifier
       resists); if IT also leaks >=0.6, f-mnist's GAN is just weaker
       and P15/P16 say nothing encoder-specific.

Run: python scripts/round5g_queue.py [only_leg ...]   (cwd=/root/repo)
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

ADVSET = "output/advsets/fmnist_conf_enc2x50.npz"
OP_2X50 = ["--override", "REC_RR=2", "--override", "REC_ITERS=50"]
ENC = ["--override", "REC_INIT=encoder"]
FMNIST_CONF = ["--cfg", "output/gans/f-mnist", "--model", "A",
               "--attack_type", "spsa", "--num_tests", "128",
               "--attack_batch", "64", "--spsa_iters", "80",
               "--spsa_samples", "64", "--spsa_chunk", "8",
               "--spsa_objective", "confident",
               "--spsa_margin_kappa", "32.56",
               "--spsa_rec_penalty", "300",
               "--spsa_center_quantiles", "0.45", "0.55", "--detect"]

LEGS = [
    # encoder for the f-mnist GAN (minutes; idempotent per run)
    {"name": "r5g_train_encoder_fmnist", "run": "script",
     "path": "train.py",
     "argv": ["--cfg", "output/gans/f-mnist", "--train_encoder"]},
    # control: direct confident at the reference point
    {"name": "r5g_conf_fmnist_10x200", "run": "script", "path": "whitebox.py",
     "argv": FMNIST_CONF + [
         "--detect_save", "output/detstats/fmnist_conf_rand10x200.npz"]},
    # P15: the operating point
    {"name": "r5g_conf_fmnist_enc2x50", "run": "script", "path": "whitebox.py",
     "argv": FMNIST_CONF + OP_2X50 + ENC + [
         "--save_adv", ADVSET,
         "--detect_save", "output/detstats/fmnist_conf_enc2x50.npz"]},
    # P16: the transfer
    {"name": "r5g_escalate_fmnist", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/f-mnist", "--model", "A",
              "--attack_type", "none", "--num_tests", "128",
              "--load_adv", ADVSET, "--detect",
              "--detect_save",
              "output/detstats/fmnist_conf_enc2x50_at10x200.npz"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5g")
