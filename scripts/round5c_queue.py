#!/usr/bin/env python
"""Round-5c chip queue: the encoder operating point vs the STRONGEST attacks.

Round-5b measured the amortized-init frontier (encoder (R=2, L=50) is
iso-quality with the reference (10, 200) protocol at 2.4x end-to-end
serving throughput) — but its FGSM rows also showed one-step gradients
through E obfuscate on digits (the crafted attack got WEAKER: bare adv
acc 0.55-0.86). A cheap attack getting weaker is not a defense result;
the serving claim needs the operating point measured against the
round-5 attack suite's strongest members, which do not depend on
E's gradients:

  - gradient-free SPSA (plain + confident/centered), which probes the
    DEPLOYED forward pass bit-for-bit (gan.reconstruct honors rec_init),
  - CW-L2 through the exact unrolled graph (digits' worst cell: 5.1%
    joint leak at (10, 200)).

All legs run at --override REC_RR=2 REC_ITERS=50 REC_INIT=encoder — the
serving operating point — with the same budgets as the round-5 cells so
rows are directly comparable. Centers for the detection-aware SPSA use
--spsa_center_quantiles 0.45 0.55: per-image centers in a tight band
around the clean rec-err MEDIAN, measured from one clean pass of the
deployed config at craft time (the (10,200) constants 0.033/0.0017 do
not transfer to the new clean distribution; the flag's validation
requires LO < HI, so the band is the self-calibrated near-median
choice).

Pre-registered predictions:
  P5. Plain SPSA breaks purification about as hard as at (10, 200)
      (flagship 2.3% defended) and detection still catches it (joint
      ~0) — the attack is config-agnostic.
  P6. Confident/centered SPSA leaks in the same band as the (10, 200)
      cells (flagship 0.227, digits 0.219 joint) — the structural leak
      is a property of the FEATURE SET, not of (R, L, init). A much
      LARGER leak at the operating point would force rec_init=encoder
      to ship with a bigger-R caveat; a smaller one would mean the
      encoder's tighter clean rec-err distribution actually helps the
      detector.
  P7. CW-on-digits at the operating point stays in the ~5% joint band
      (the leak was attacker-strategy-invariant at (10, 200)).

Run: python scripts/round5c_queue.py [only_leg ...]   (cwd=/root/repo)
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

ENC_OP = ["--override", "REC_RR=2", "--override", "REC_ITERS=50",
          "--override", "REC_INIT=encoder"]
FLAGSHIP_SPSA = ["--cfg", "output/gans/mnist_fast", "--model", "A",
                 "--attack_type", "spsa", "--num_tests", "128",
                 "--attack_batch", "64", "--spsa_iters", "80",
                 "--spsa_samples", "64", "--spsa_chunk", "8", "--detect"]
DIGITS_SPSA = ["--cfg", "output/gans/digits", "--model", "A",
               "--attack_type", "spsa", "--num_tests", "128",
               "--attack_batch", "64", "--spsa_iters", "80",
               "--spsa_samples", "64", "--spsa_chunk", "8", "--detect"]

LEGS = [
    {"name": "r5c_spsa_flagship_enc", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + ENC_OP},
    {"name": "r5c_conf_flagship_enc", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + ENC_OP + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "31.65",
         "--spsa_rec_penalty", "300",
         "--spsa_center_quantiles", "0.45", "0.55",
         "--detect_save", "output/detstats/flagship_conf_enc2x50.npz"]},
    {"name": "r5c_conf_digits_enc", "run": "script", "path": "whitebox.py",
     "argv": DIGITS_SPSA + ENC_OP + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "9.67",
         "--spsa_rec_penalty", "6000",
         "--spsa_center_quantiles", "0.45", "0.55",
         "--detect_save", "output/detstats/digits_conf_enc2x50.npz"]},
    {"name": "r5c_cw_digits_enc", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "cw", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "50",
              "--attack_batch", "128", "--cw_max_iterations", "200",
              "--cw_binary_search_steps", "4", "--cw_abort_early",
              "--cw_chunk_iters", "25", "--detect"] + ENC_OP + [
              "--detect_save", "output/detstats/digits_cw_enc2x50.npz"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5c")
