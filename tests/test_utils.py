"""Utils tests: image grids, JSONL metrics, profiling helpers
(reference: utils/visualize.py, utils/misc.py of kabkabm/defensegan; the
profiling module is new — SURVEY.md section 5 lists no tracing subsystem in
the reference)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
from defensegan_tpu.utils.profiling import PhaseTimer, nan_guard
from defensegan_tpu.utils.visualize import merge, save_images, save_images_files


def test_merge_grid_layout():
    imgs = np.zeros((6, 4, 4, 1), np.float32)
    for i in range(6):
        imgs[i] = i / 10.0
    tiled = merge(imgs, grid=(2, 3))
    assert tiled.shape == (8, 12, 1)
    assert tiled[0, 0, 0] == 0.0
    assert abs(tiled[0, 4, 0] - 0.1) < 1e-6   # second image in row 0
    assert abs(tiled[4, 0, 0] - 0.3) < 1e-6   # first image in row 1


def test_save_images_roundtrip(tmp_path):
    from PIL import Image

    imgs = np.random.RandomState(0).rand(4, 8, 8, 1).astype(np.float32)
    path = save_images(imgs, str(tmp_path / "grid.png"), grid=(2, 2))
    with Image.open(path) as im:
        assert im.size == (16, 16)
    save_images_files(imgs, str(tmp_path / "files"), labels=[1, 2, 3, 4])
    assert len(os.listdir(tmp_path / "files")) == 4


def test_append_jsonl(tmp_path):
    p = str(tmp_path / "m" / "metrics.jsonl")
    append_jsonl(p, {"step": 1, "loss": 0.5})
    append_jsonl(p, {"step": 2, "loss": 0.25})
    rows = [json.loads(l) for l in open(p)]
    assert rows[1]["step"] == 2


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("attack"):
        _ = sum(range(1000))
    with t.phase("purify", block=jnp.ones((4,))):
        pass
    s = t.summary()
    assert s["attack"]["count"] == 1
    assert s["purify"]["total_s"] >= 0
    assert "attack" in str(t)


def test_nan_guard():
    import jax
    import pytest

    with nan_guard():
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.zeros(())) * 0 + jnp.nan  # produces NaN
    # disabled again outside the scope
    assert not jax.config.jax_debug_nans


def test_ensure_dir(tmp_path):
    p = str(tmp_path / "a" / "b")
    assert ensure_dir(p) == p
    assert os.path.isdir(p)
