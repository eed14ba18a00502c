#!/usr/bin/env python
"""Round-3 chip queue I: measure the off-manifold rejection mechanism
(scripts/mechanism_exp.py) on the queue-G checkpoints.

Run: python scripts/round3_queue_i.py  (cwd=/root/repo)
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


def step_mechanism():
    run_script("scripts/mechanism_exp.py", [])


STEPS = [
    ("mechanism", step_mechanism),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue I")
