#!/usr/bin/env python
"""Queue N2: digits CW exact-replay at R=1/L=200 — separates R from L in
the queue-L collapse (0.348 was measured at R=1/L=25; flagship shows the
replay leg flat in R at L=200)."""
import sys, os
ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))
from defensegan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from queue_lib import run_steps


def step_cw_replay_digits_r1_l200():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/digits",
                   "--attack_type", "cw", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--rec_rr", "1",
                   "--attack_rec_iters", "200", "--attack_batch", "128",
                   "--eval_z0", "both",
                   "--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4",
                   "--cw_abort_early", "--cw_chunk_iters", "25"])


STEPS = [("cw_replay_digits_r1_l200", step_cw_replay_digits_r1_l200)]

if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue N2")
