"""stream64 probe (scripts/stream64_probe.py): the phase-major packing of
a stride-2 deconv level into 9 shift-masked matmuls must reproduce XLA's
gradient through the same folded level (the probe's numerics gate). Runs
the Pallas kernel in interpret mode at tiny shapes — the on-chip A/B is
queue leg `stream64`."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

import stream64_probe as sp  # noqa: E402


@pytest.mark.parametrize("level", [0, 1, 2])
def test_fused_level_dx_matches_xla(level):
    r = sp.run_probe(level=level, batch=4, tile=2, iters=1, repeats=1,
                     interpret=True)
    assert r["numerics_ok"], r


def test_pack_level_carries_exact_tap_count():
    """The packed weight must contain exactly the deconv's 25 taps (per
    ci x co pair): zero-padded phase slots carry zeros — the honest
    1.44x FLOP inflation — and no tap is dropped or duplicated."""
    import numpy as np

    ci, co = 3, 2
    rng = np.random.RandomState(0)
    w = rng.randn(5, 5, ci, co).astype(np.float32)
    wcat, wcat_t, bias = sp.pack_level(w, np.zeros(co), np.ones(co),
                                       np.zeros(co))
    assert wcat.shape == (9, ci, 4 * co)
    nz = (wcat != 0).reshape(9, -1).any(axis=1)
    # per phase: taps = (2 or 3)^2 -> 4+6+6+9 = 25 of the 36 slots used
    used = sum(int((wcat[k, :, blk * co:(blk + 1) * co] != 0).any())
               for k in range(9) for blk in range(4))
    assert used == 25, used
    assert nz.all()  # every shift carries at least one phase's tap
    np.testing.assert_array_equal(wcat_t, np.transpose(wcat, (0, 2, 1)))
