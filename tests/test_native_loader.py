"""Native C IDX loader (defensegan_tpu/data/native): build, parse, and
exact equivalence with the numpy parser. The reference parses IDX in pure
Python (datasets/mnist.py); the rebuild keeps a native host data plane."""

import struct

import numpy as np
import pytest

from defensegan_tpu.data.dataset import _parse_idx_bytes
from defensegan_tpu.data.native import load_native, parse_idx_u8


def _idx_bytes(arr: np.ndarray) -> bytes:
    header = struct.pack(">HBB", 0, 0x08, arr.ndim)
    header += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    return header + arr.astype(np.uint8).tobytes()


@pytest.fixture(scope="module")
def native_lib():
    lib = load_native()
    if lib is None:
        pytest.skip("no C toolchain available to build the native loader")
    return lib


def test_native_matches_numpy(native_lib):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(37, 28, 28), dtype=np.uint8)
    raw = _idx_bytes(arr)
    got = parse_idx_u8(raw, nthreads=4)
    assert got is not None and got.dtype == np.float32
    expected = _parse_idx_bytes(raw).astype(np.float32) / 255.0
    # native multiplies by (1/255)f, numpy divides — 1 ulp apart
    np.testing.assert_allclose(got, expected, rtol=2e-7, atol=0)


def test_native_rejects_non_u8(native_lib):
    # float32 IDX (dtype code 0x0D) must fall back to the Python parser
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    raw = (struct.pack(">HBB", 0, 0x0D, 2)
           + struct.pack(">II", 3, 4)
           + arr.astype(">f4").tobytes())
    assert parse_idx_u8(raw) is None
    np.testing.assert_array_equal(_parse_idx_bytes(raw), arr)


def test_native_rejects_truncated(native_lib):
    arr = np.zeros((4, 4), np.uint8)
    raw = _idx_bytes(arr)[:-3]
    assert parse_idx_u8(raw) is None


def test_end_to_end_mnist_idx_via_native(tmp_path):
    """The Mnist loader path must produce identical data with/without the
    native loader available."""
    import gzip

    from defensegan_tpu.data import get_dataset

    rng = np.random.RandomState(1)
    n = 9
    imgs = rng.randint(0, 256, size=(n, 28, 28), dtype=np.uint8)
    labels = (np.arange(n) % 10).astype(np.uint8)
    d = tmp_path / "mnist"
    d.mkdir()
    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(_idx_bytes(imgs))
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBBI", 0, 0x08, 1, n) + labels.tobytes())
    x, y = get_dataset("mnist", data_dir=str(tmp_path)).load("test")
    np.testing.assert_allclose(x[..., 0], imgs.astype(np.float32) / 255.0,
                               rtol=2e-7, atol=0)
    np.testing.assert_array_equal(y, labels)
