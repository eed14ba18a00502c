#!/usr/bin/env python
"""FGSM epsilon sweep on the digits dataset (real handwriting): shows the
defense's recovery as a function of attack strength relative to the data's
contrast (paper Figure-style analysis)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.cli import whitebox  # noqa: E402

for eps in (0.05, 0.1, 0.15, 0.2, 0.3):
    print("=" * 70, f"\nFGSM eps={eps}\n", "=" * 70)
    whitebox.main([
        "--cfg", "output/gans/digits", "--attack_type", "fgsm",
        "--defense_type", "defense_gan", "--model", "A",
        "--num_tests", "128", "--fgsm_eps", str(eps),
        "--attack_rec_iters", "100", "--save_images",
        "--results_dir", "output/results/eps_sweep"])
