#!/usr/bin/env python
"""Round-3 chip queue M: restart-diversity curve for CW exact replay.

Queue L showed CW's exact-replay leg collapses at R=1 (0.348) while the
paper default R=10 holds 0.707 (digits, L=200 endpoints: queue F). The
two intermediate points turn "restart diversity is what CW cannot
replay through" into a curve: craft CW through the unrolled R-restart
L=200 graph and evaluate with the attacker's exact z0 at R in {2, 5}.

Run: python scripts/round3_queue_m.py  (cwd=/root/repo)
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


def _wb(rr):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/digits",
                   "--attack_type", "cw", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--rec_rr", str(rr),
                   "--attack_rec_iters", "200", "--attack_batch", "128",
                   "--eval_z0", "both",
                   "--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4",
                   "--cw_abort_early", "--cw_chunk_iters", "25"])


def step_cw_replay_r2():
    _wb(2)


def step_cw_replay_r5():
    _wb(5)


STEPS = [
    ("cw_replay_r2", step_cw_replay_r2),
    ("cw_replay_r5", step_cw_replay_r5),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue M")
