"""Kernel-quality metrics for alternative projection paths.

New vs the reference (which has a single TF graph and no numerics-variant
kernels to compare). Used to gate the int8 (v2i) Pallas kernel against the
f32/XLA projection: raw argmin agreement under-reports quality because
restarts whose final losses tie within bf16 noise are interchangeable —
picking either is not an error (VERDICT round-2 item 6). The tie-aware
metric charges a disagreement only when the chosen restart is MATERIALLY
worse under the reference losses.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# Measured bf16-vs-f32 final-loss jitter on the flagship (RESULTS.md round
# 2: loss diffs <= 1.4e-3 between equal-quality restarts); gaps below this
# are ties, not quality differences.
BF16_TIE_TAU = 2e-3


def tie_aware_disagreement(ref_losses: np.ndarray,
                           test_losses: np.ndarray,
                           tau: float = BF16_TIE_TAU) -> Dict[str, float]:
    """Compare restart selections of a test path against a reference path.

    ref_losses, test_losses: [B, R] final per-restart losses of the SAME
    (x, z0) draws under the reference (f32/XLA) and test (e.g. int8)
    paths. The test path's pick for image i is test_losses[i].argmin();
    its quality is judged under the REFERENCE losses: regret_i =
    ref[i, test_pick] - ref[i].min().

    Returns:
      raw_disagreement:      fraction of images where the argmins differ
                             (the old metric — counts harmless ties)
      material_disagreement: fraction where regret > tau (real quality
                             loss beyond bf16 noise)
      mean_regret, max_regret: regret stats in loss units
      tau: the tie threshold used
    """
    ref = np.asarray(ref_losses, np.float64)
    test = np.asarray(test_losses, np.float64)
    if ref.shape != test.shape or ref.ndim != 2:
        raise ValueError(f"need matching [B, R] losses, got {ref.shape} "
                         f"vs {test.shape}")
    idx = np.arange(ref.shape[0])
    pick_t = test.argmin(1)
    pick_r = ref.argmin(1)
    regret = ref[idx, pick_t] - ref[idx, pick_r]
    return {
        "raw_disagreement": float((pick_t != pick_r).mean()),
        "material_disagreement": float((regret > tau).mean()),
        "mean_regret": float(regret.mean()),
        "max_regret": float(regret.max()),
        "tau": float(tau),
    }
