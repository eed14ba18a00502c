#!/usr/bin/env python
"""Round-3 chip queue J: R x L ablation grid on real digits
(scripts/rl_ablation_exp.py — the paper's R/L knob figures).

Run: python scripts/round3_queue_j.py  (cwd=/root/repo)
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


def step_rl_ablation():
    run_script("scripts/rl_ablation_exp.py", [])


def step_rl_ablation_salt():
    run_script("scripts/rl_ablation_exp.py", ["restore", "salt", "0.4"])


def step_rl_ablation_smooth():
    run_script("scripts/rl_ablation_exp.py", ["restore", "smooth", "0.4"])


STEPS = [
    ("rl_ablation", step_rl_ablation),
    ("rl_ablation_salt", step_rl_ablation_salt),
    ("rl_ablation_smooth", step_rl_ablation_smooth),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue J")
