"""Watermark generator of the collapse-and-restore experiment
(scripts/restore_exp.py::make_marks).

The experiment's claim — restore magnitude is governed by how
GAN-learnable the small-margin feature is — rests on the two watermark
families being equally discriminative but differing in frequency
content. Pin those properties.
"""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

import restore_exp  # noqa: E402


@pytest.mark.parametrize("style", ["salt", "smooth"])
def test_marks_shape_range_determinism(style):
    m = restore_exp.make_marks(0.4, style, seed=0)
    assert m.shape == (10, 28, 28, 1)
    assert m.dtype == np.float32
    assert float(m.min()) >= 0.0  # positive: survives the [0,1] clip
    assert float(m.max()) <= 0.4 + 1e-6
    m2 = restore_exp.make_marks(0.4, style, seed=0)
    np.testing.assert_array_equal(m, m2)


@pytest.mark.parametrize("style", ["salt", "smooth"])
def test_marks_discriminative(style):
    m = restore_exp.make_marks(0.4, style, seed=0)
    d = [np.linalg.norm(m[i] - m[j])
         for i in range(10) for j in range(i + 1, 10)]
    # every class pair separable well beyond bf16/projection noise
    assert min(d) > 1.0


def test_smooth_is_low_frequency_salt_is_not():
    # mean absolute neighbor difference, normalized by amplitude: high
    # for iid salt, low for the Gaussian blob fields
    def roughness(m):
        dx = np.abs(np.diff(m[..., 0], axis=2)).mean()
        dy = np.abs(np.diff(m[..., 0], axis=1)).mean()
        return (dx + dy) / 2 / 0.4

    salt = roughness(restore_exp.make_marks(0.4, "salt", seed=0))
    smooth = roughness(restore_exp.make_marks(0.4, "smooth", seed=0))
    assert salt > 0.3       # iid Bernoulli: ~0.5 expected
    assert smooth < 0.1     # blobs vary over sigma>=2.5 px
    assert smooth < salt / 5


def test_unknown_style_rejected():
    with pytest.raises(AssertionError):
        restore_exp.make_marks(0.1, "checker", seed=0)
