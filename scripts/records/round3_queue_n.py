#!/usr/bin/env python
"""Round-3 chip queue N: bench sanity + flagship restart-diversity points.

1. bench_sanity — run the driver benchmark (bench.py) end-to-end once in
   this round's final code state, so BENCH_r03.json has a known-good dry
   run behind it (headline wide/int8 + deep v3 legs, one JSON line).
2. cw_replay_flagship_r{1,2} — queue M measured the CW exact-replay
   restart curve on digits (step function: 0.348 at R=1, ~0.68 flat from
   R=2). These two points ask whether the step generalizes to the wide
   flagship arch (mnist_fast; R=10 endpoint 0.582 from queue F): craft
   CW 200x4 through the unrolled R-restart L=200 graph, evaluate with
   the attacker's exact z0 (pinned-kernel replay) at R in {1, 2}.

Run: python scripts/round3_queue_n.py  (cwd=/root/repo)
"""

import sys
import os

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import run_script, run_steps  # noqa: E402


def step_bench_sanity():
    run_script("bench.py", [])


def _wb(rr):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/mnist_fast",
                   "--attack_type", "cw", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "256",
                   "--classifier_epochs", "10",
                   "--rec_rr", str(rr),
                   "--attack_rec_iters", "200", "--attack_batch", "256",
                   "--eval_z0", "both",
                   "--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4",
                   "--cw_abort_early", "--cw_chunk_iters", "25"])


def step_cw_replay_flagship_r1():
    _wb(1)


def step_cw_replay_flagship_r2():
    _wb(2)


STEPS = [
    ("bench_sanity", step_bench_sanity),
    ("cw_replay_flagship_r1", step_cw_replay_flagship_r1),
    ("cw_replay_flagship_r2", step_cw_replay_flagship_r2),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue N")
