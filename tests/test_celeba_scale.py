"""CelebA at-scale data path: one-time JPEG -> uint8 .npy cache, memory-
mapped loads, and uint8 device-resident training (VERDICT round-1 item 6:
the per-image PIL loop must not run on every load)."""

import os

import numpy as np
import pytest

from defensegan_tpu.data.dataset import CelebA


def _make_fake_celeba(root, n=12):
    """Tiny CelebA-layout tree: n JPEGs + list_attr_celeba.txt."""
    from PIL import Image

    img_dir = os.path.join(root, "celeba", "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names, labels = [], []
    for i in range(n):
        name = f"{i + 1:06d}.jpg"
        arr = rng.randint(0, 255, (218, 178, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        names.append(name)
        labels.append(1 if i % 2 == 0 else -1)
    # header: count, attr names; rows: name, attrs (Male second)
    lines = [str(n), "Arched_Eyebrows Male Smiling"]
    for name, lab in zip(names, labels):
        lines.append(f"{name} -1 {lab} 1")
    with open(os.path.join(root, "celeba", "list_attr_celeba.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return img_dir


def test_cache_build_and_mmap_reload(tmp_path):
    root = str(tmp_path)
    img_dir = _make_fake_celeba(root, n=12)
    ds = CelebA(data_dir=root)
    # fake tree is tiny; all 12 land in the 'train' split window
    x, y = ds.load_u8("train")
    assert x.shape == (12, 64, 64, 3) and x.dtype == np.uint8
    assert isinstance(x, np.memmap)
    np.testing.assert_array_equal(y, (np.arange(12) % 2 == 0).astype(int))

    # cache hit: delete the JPEGs — loads must keep working (no re-decode)
    import shutil
    shutil.rmtree(img_dir)
    x2, y2 = CelebA(data_dir=root).load_u8("train")
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    np.testing.assert_array_equal(y2, y)

    # float API agrees with the uint8 store
    xf, yf = CelebA(data_dir=root).load("train")
    assert xf.dtype == np.float32 and xf.max() <= 1.0
    np.testing.assert_allclose(xf, np.asarray(x, np.float32) / 255.0)


def test_load_u8_synthetic_fallback(tmp_path):
    ds = CelebA(data_dir=str(tmp_path / "nope"))
    x, y = ds.load_u8("dev")
    assert x.dtype == np.uint8 and x.shape[1:] == (64, 64, 3)
    xf, _ = ds.load("dev")
    np.testing.assert_allclose(np.asarray(x, np.float32) / 255.0, xf,
                               atol=1 / 255.0)


def test_uint8_training_smoke(tmp_path):
    """The WGAN step must train straight off a uint8 device-resident set."""
    import jax

    from defensegan_tpu.configs import Config
    from defensegan_tpu.data.synthetic import make_synthetic
    from defensegan_tpu.gan import DefenseGAN

    cfg = Config(type="mnist", gen_dim=4, disc_dim=4, latent_dim=16,
                 batch_size=8, disc_iters=1, compute_dtype="float32",
                 sample_every=10**9, save_every=10**9,
                 output_dir=str(tmp_path / "run"))
    gan = DefenseGAN(cfg)
    x, _ = make_synthetic(64, 28, 1, seed=0)
    x_u8 = (x * 255).round().astype(np.uint8)
    metrics = gan.train(x_u8, train_iters=3, log_every=3, quiet=True)
    assert all(np.isfinite(v) for v in metrics.values())


@pytest.mark.slow
def test_mmap_load_scales(tmp_path):
    """Capacity: loading a cached split is O(ms) via mmap, independent of N
    (here 20k images = 240 MB; scripts/celeba_capacity.py proves 200k)."""
    import time

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "celeba"), exist_ok=True)
    ds = CelebA(data_dir=root)
    img_path, lbl_path = ds._cache_paths("train")
    n = 20000
    arr = np.lib.format.open_memmap(img_path, mode="w+", dtype=np.uint8,
                                    shape=(n, 64, 64, 3))
    arr[:] = 7
    arr.flush()
    del arr
    np.save(lbl_path, np.zeros(n, np.int32))

    t0 = time.perf_counter()
    x, y = ds.load_u8("train")
    dt = time.perf_counter() - t0
    assert x.shape[0] == n
    assert dt < 1.0, f"mmap load took {dt:.2f}s — not O(1)"
    # touching a random slice is cheap too
    assert int(x[n - 5:n].max()) == 7
