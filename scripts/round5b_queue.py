#!/usr/bin/env python
"""Round-5b chip queue: the amortized-inversion encoder measured.

The encoder init (defense/encoder_init.py — a TPU-first extension, no
reference equivalent) claims the projection can serve at much smaller
(R, L) from an E(x) start without giving up defense quality. These legs
measure that claim on the flagship (wide/dim16, synthetic mnist) and on
digits (REAL handwriting — the credibility anchor):

  1. enc_train_*     train the encoder against the frozen generator
                     (~3k steps, minutes).
  2. enc_frontier_*  the (R, L) x init grid: clean defended acc,
                     FGSM-through-defense (exact grad THROUGH the encoder
                     — attacks/compose.py honors rec_init), two-sided +
                     combined detection, joint undetected, recon/s.
  3. enc_serving_*   DefendedPipeline latency at the encoder operating
                     points on the gate-stamped int8 kernel (serving_bench
                     --rec_init), vs the R=10/L=200 baseline rows already
                     in serving_bench.jsonl.

Pre-registered predictions (written BEFORE the legs ran):
  P1. On-manifold quality transfers: encoder cells at (2, 50) match
      random (10, 200) clean defended accuracy within noise, at ~20x less
      projection compute.
  P2. The hybrid "encoder" mode preserves the restart lottery, so its
      FGSM robustness tracks random-init at equal (R, L); "encoder_jitter"
      gives up lottery diversity and may lose robustness at small sigma.
  P3. Detection survives: the rec-err statistic's clean distribution
      SHIFTS (lower errors from a better optimum) but stays separable —
      AUCs at the cell's own calibration stay comparable to random-init
      cells at equal (R, L).
  P4. The attacker does NOT win from differentiating through E: FGSM
      through encoder-init at (10, 200) lands within a few points of the
      random-init cell (the projection still dominates the input-output
      map). A large defended-acc DROP on encoder cells at equal (R, L)
      would falsify the feature as a defense option.

digits legs retrain the (gitignored, wiped-on-fresh-machine) digits GAN
first via the round-4 queue's train leg.

Run: python scripts/round5b_queue.py [only_leg ...]   (cwd=/root/repo)
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

GRID = ["10x200", "4x100", "2x50", "1x25"]
INITS = ["random", "encoder", "encoder_jitter"]

LEGS = [
    # -- flagship -------------------------------------------------------
    {"name": "r5b_enc_train_flagship", "run": "script",
     "path": "scripts/encoder_exp.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--legs", "train"]},
    {"name": "r5b_enc_frontier_flagship", "run": "script",
     "path": "scripts/encoder_exp.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--legs", "frontier", "--grid", *GRID, "--inits", *INITS,
              "--num_tests", "256"]},

    # -- digits (real data; retrain the wiped GAN first) ----------------
    {"name": "r5b_train_digits", "run": "script",
     "path": "scripts/round4_queue.py", "argv": ["train_digits"]},
    {"name": "r5b_enc_train_digits", "run": "script",
     "path": "scripts/encoder_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--legs", "train"]},
    {"name": "r5b_enc_frontier_digits", "run": "script",
     "path": "scripts/encoder_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--legs", "frontier", "--grid", *GRID, "--inits", *INITS,
              "--num_tests", "256"]},

    # -- serving at the encoder operating points (int8 kernel) ----------
    {"name": "r5b_enc_serving_2x50", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--kernel", "pallas_int8", "--rec_rr", "2",
              "--rec_iters", "50", "--rec_init", "encoder",
              "--batches", "256", "16384", "--repeats", "3"]},
    {"name": "r5b_enc_serving_1x25", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--kernel", "pallas_int8", "--rec_rr", "1",
              "--rec_iters", "25", "--rec_init", "encoder_jitter",
              "--batches", "256", "16384", "--repeats", "3"]},
]


if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:], label="round5b")
