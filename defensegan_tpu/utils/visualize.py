"""Image-grid savers.

Reference parity: utils/visualize.py of kabkabm/defensegan (DCGAN-tensorflow
lineage `merge` / `save_images` / per-image `save_images_files`).
Images are float arrays in [0, 1], NHWC.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from defensegan_tpu.utils.misc import ensure_dir


def merge(images: np.ndarray,
          grid: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Tile [N,H,W,C] into one [gh*H, gw*W, C] grid image."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if grid is None:
        gw = int(math.ceil(math.sqrt(n)))
        gh = int(math.ceil(n / gw))
    else:
        gh, gw = grid
    out = np.zeros((gh * h, gw * w, c), dtype=images.dtype)
    for idx in range(min(n, gh * gw)):
        i, j = divmod(idx, gw)
        out[i * h:(i + 1) * h, j * w:(j + 1) * w] = images[idx]
    return out


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_images(images: np.ndarray, path: str,
                grid: Optional[Tuple[int, int]] = None) -> str:
    """Save an [N,H,W,C] batch as one PNG grid (reference: save_images)."""
    from PIL import Image

    ensure_dir(os.path.dirname(path) or ".")
    tiled = _to_uint8(merge(images, grid))
    if tiled.shape[-1] == 1:
        tiled = tiled[..., 0]
    Image.fromarray(tiled).save(path)
    return path


def save_images_files(images: np.ndarray, out_dir: str, prefix: str = "img",
                      labels: Optional[Sequence[int]] = None) -> None:
    """Per-image PNG dumps (reference: save_images_files)."""
    from PIL import Image

    ensure_dir(out_dir)
    for i, img in enumerate(images):
        arr = _to_uint8(img)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        tag = f"_{labels[i]}" if labels is not None else ""
        Image.fromarray(arr).save(os.path.join(out_dir,
                                               f"{prefix}_{i:05d}{tag}.png"))
