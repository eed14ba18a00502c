"""Config system, data layer, and checkpoint roundtrip tests
(reference: utils/config.py, datasets/, models/base_model.py of
kabkabm/defensegan)."""

import os

import jax
import numpy as np
import pytest

from defensegan_tpu.ckpt import latest_step, restore_checkpoint, save_checkpoint
from defensegan_tpu.configs import Config, load_config, save_config
from defensegan_tpu.data import get_dataset

PKG_CFGS = os.path.join(os.path.dirname(__file__), "..", "defensegan_tpu",
                        "configs", "gans")


@pytest.mark.parametrize("name,typ,hw,c", [
    ("mnist.yml", "mnist", 28, 1),
    ("fmnist.yml", "f-mnist", 28, 1),
    ("celeba.yml", "celeba", 64, 3),
])
def test_shipped_configs_load(name, typ, hw, c):
    cfg = load_config(os.path.join(PKG_CFGS, name))
    assert cfg.type == typ
    assert cfg.image_size == hw and cfg.channels == c
    assert cfg.rec_iters == 200 and cfg.rec_lr == 10.0  # paper defaults


def test_overrides_and_output_dir_roundtrip(tmp_path):
    cfg = load_config(os.path.join(PKG_CFGS, "mnist.yml"),
                      overrides={"BATCH_SIZE": 8, "rec_rr": 3})
    assert cfg.batch_size == 8 and cfg.rec_rr == 3
    cfg = cfg.replace(output_dir=str(tmp_path / "run"))
    save_config(cfg)
    # reference UX: --cfg <output-dir> re-loads the stored cfg
    cfg2 = load_config(str(tmp_path / "run"))
    assert cfg2.batch_size == 8 and cfg2.rec_rr == 3
    assert cfg2.type == "mnist"


def test_unknown_override_rejected():
    with pytest.raises(ValueError, match="unknown config overrides"):
        load_config(os.path.join(PKG_CFGS, "mnist.yml"),
                    overrides={"NOT_A_KEY": 1})


@pytest.mark.parametrize("name,hw,c,k", [("mnist", 28, 1, 10),
                                         ("f-mnist", 28, 1, 10),
                                         ("celeba", 64, 3, 2)])
def test_dataset_synthetic_fallback(name, hw, c, k, tmp_path):
    ds = get_dataset(name, data_dir=str(tmp_path))
    for split in ("train", "dev", "test"):
        x, y = ds.load(split)
        assert x.ndim == 4 and x.shape[1:] == (hw, hw, c)
        assert x.dtype == np.float32
        assert 0.0 <= x.min() and x.max() <= 1.0
        assert y.shape == (x.shape[0],)
        assert set(np.unique(y)) <= set(range(k))
    # deterministic + split-disjoint sampling
    x2, _ = ds.load("train")
    np.testing.assert_array_equal(ds.load("train")[0], x2)
    assert not np.array_equal(ds.load("train")[0][:8], ds.load("test")[0][:8])


def test_mnist_idx_parsing(tmp_path):
    """Write tiny IDX files and check the real-data path parses them."""
    import gzip
    import struct

    d = tmp_path / "mnist"
    d.mkdir()
    n = 12
    imgs = (np.arange(n * 28 * 28) % 256).astype(np.uint8).reshape(n, 28, 28)
    labels = (np.arange(n) % 10).astype(np.uint8)
    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBBIII", 0, 0x08, 3, n, 28, 28))
        f.write(imgs.tobytes())
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBBI", 0, 0x08, 1, n))
        f.write(labels.tobytes())
    ds = get_dataset("mnist", data_dir=str(tmp_path))
    x, y = ds.load("test")
    assert x.shape == (n, 28, 28, 1)
    np.testing.assert_allclose(x.max(), 255.0 / 255.0)
    np.testing.assert_array_equal(y, labels)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(7, np.int32)}
    out = str(tmp_path / "run")
    assert latest_step(out) is None
    save_checkpoint(out, 7, state)
    save_checkpoint(out, 11, jax.tree.map(lambda a: a * 2, state))
    assert latest_step(out) == 11
    restored = restore_checkpoint(out, state)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"] * 2)
    restored7 = restore_checkpoint(out, state, step=7)
    np.testing.assert_array_equal(restored7["params"]["w"],
                                  state["params"]["w"])
