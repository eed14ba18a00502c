"""Deterministic synthetic image datasets (offline stand-ins).

Not in the reference (it downloads real data; datasets/utils.py). Used here so
training / defense / attack pipelines run end-to-end with zero network access:
class k is a fixed random low-frequency prototype; samples are the prototype
plus small jitter and random shifts. Learnable by both the classifiers and the
WGAN, and fully deterministic given the seed.
"""

from __future__ import annotations

import numpy as np


def _smooth(img: np.ndarray, iters: int = 2) -> np.ndarray:
    """Cheap box blur to give prototypes digit-like low-frequency structure."""
    for _ in range(iters):
        p = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        img = (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
               + p[1:-1, 1:-1]) / 5.0
    return img


def make_synthetic(num: int, image_size: int, channels: int,
                   num_classes: int = 10, seed: int = 0,
                   split: str = "train"):
    """Return (images [N,H,W,C] float32 in [0,1], labels [N] int32)."""
    split_salt = {"train": 0, "dev": 1, "val": 1, "test": 2}.get(split, 3)
    rng = np.random.RandomState(seed * 7919 + 17)
    protos = []
    for _ in range(num_classes):
        p = rng.rand(image_size, image_size, channels).astype(np.float32)
        p = _smooth(p, iters=3)
        # stretch contrast so prototypes are well separated
        p = (p - p.min()) / max(p.max() - p.min(), 1e-6)
        protos.append(p)
    protos = np.stack(protos)  # [K, H, W, C]

    srng = np.random.RandomState(seed * 104729 + split_salt * 7907 + 23)
    labels = srng.randint(0, num_classes, size=num).astype(np.int32)
    images = protos[labels].copy()
    # per-sample jitter: noise + random 1-pixel shift
    noise = srng.randn(*images.shape).astype(np.float32) * 0.08
    images = images + noise
    shifts = srng.randint(-1, 2, size=(num, 2))
    for i, (dy, dx) in enumerate(shifts):
        images[i] = np.roll(images[i], (dy, dx), axis=(0, 1))
    return np.clip(images, 0.0, 1.0), labels
