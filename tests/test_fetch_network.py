"""End-to-end exercise of the download path over a REAL network socket.

The build environment has zero egress, so fetch.py's urllib path had only
ever run to its failure branch. This test closes that gap without egress:
a loopback http.server serves valid gzipped IDX files, maybe_download
fetches them through urllib, and Dataset.load parses the result — the
exact pipeline a user with internet runs (reference: datasets/utils.py +
datasets/mnist.py of kabkabm/defensegan).
"""

import gzip
import http.server
import os
import struct
import threading

import numpy as np

from defensegan_tpu.data.dataset import get_dataset
from defensegan_tpu.data.fetch import MNIST_FILES, maybe_download


def _write_idx_set(root, n_train=16, n_test=12, seed=0):
    """Write all four MNIST-layout IDX .gz files into `root`."""
    rng = np.random.RandomState(seed)
    out = {}
    for prefix, n in (("train", n_train), ("t10k", n_test)):
        imgs = rng.randint(0, 256, size=(n, 28, 28)).astype(np.uint8)
        labels = (np.arange(n) % 10).astype(np.uint8)
        with gzip.open(os.path.join(root, f"{prefix}-images-idx3-ubyte.gz"),
                       "wb") as f:
            f.write(struct.pack(">HBBIII", 0, 0x08, 3, n, 28, 28))
            f.write(imgs.tobytes())
        with gzip.open(os.path.join(root, f"{prefix}-labels-idx1-ubyte.gz"),
                       "wb") as f:
            f.write(struct.pack(">HBBI", 0, 0x08, 1, n))
            f.write(labels.tobytes())
        out[prefix] = (imgs, labels)
    return out


class _QuietHandler(http.server.SimpleHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass


def _serve(directory):
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: _QuietHandler(*a, directory=directory, **kw))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}/"


def test_download_parse_load_end_to_end(tmp_path):
    srv_root = tmp_path / "server"
    srv_root.mkdir()
    written = _write_idx_set(str(srv_root))
    httpd, base = _serve(str(srv_root))
    try:
        data_dir = tmp_path / "data"
        ok = maybe_download(
            "mnist", str(data_dir), quiet=True,
            mirrors={"mnist": {"urls": [base], "files": MNIST_FILES}})
        assert ok is True
        for fname in MNIST_FILES:
            assert (data_dir / "mnist" / fname).exists()

        ds = get_dataset("mnist", data_dir=str(data_dir))
        x, y = ds.load("test")
        t10k_imgs, t10k_labels = written["t10k"]
        assert x.shape == (len(t10k_labels), 28, 28, 1)
        np.testing.assert_allclose(
            x[..., 0], t10k_imgs.astype(np.float32) / 255.0, atol=1e-7)
        np.testing.assert_array_equal(y, t10k_labels)

        # idempotent: second call sees the files and fetches nothing
        httpd.shutdown()
        assert maybe_download(
            "mnist", str(data_dir), quiet=True,
            mirrors={"mnist": {"urls": [base], "files": MNIST_FILES}}) is True
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_download_mirror_failover(tmp_path):
    """First mirror is dead (connection refused); the second serves."""
    srv_root = tmp_path / "server"
    srv_root.mkdir()
    _write_idx_set(str(srv_root))
    httpd, base = _serve(str(srv_root))
    try:
        dead = "http://127.0.0.1:9/"  # discard port: refused immediately
        ok = maybe_download(
            "mnist", str(tmp_path / "data"), quiet=True,
            mirrors={"mnist": {"urls": [dead, base], "files": MNIST_FILES}})
        assert ok is True
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_download_404_leaves_no_partial_file(tmp_path):
    """A mirror that 404s must not leave a corrupt dest file behind."""
    srv_root = tmp_path / "server"  # empty: every GET is a 404
    srv_root.mkdir()
    httpd, base = _serve(str(srv_root))
    try:
        data_dir = tmp_path / "data"
        ok = maybe_download(
            "mnist", str(data_dir), quiet=True,
            mirrors={"mnist": {"urls": [base], "files": MNIST_FILES}})
        assert ok is False
        for fname in MNIST_FILES:
            assert not (data_dir / "mnist" / fname).exists()
    finally:
        httpd.shutdown()
        httpd.server_close()
