#!/usr/bin/env python
"""Honest capacity proof for the CelebA-at-scale data path (VERDICT item 6):
build a 202,599-image uint8 cache (the real CelebA size, 2.4 GB), then show
`load_u8` is O(ms) and batch gathers stream at disk/page-cache speed.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/celeba_capacity.py [dir]
"""

import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.data.dataset import CelebA  # noqa: E402

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/celeba_capacity"
N_TRAIN = 162_770  # real CelebA train split size

shutil.rmtree(root, ignore_errors=True)
os.makedirs(os.path.join(root, "celeba"), exist_ok=True)
ds = CelebA(data_dir=root)
img_path, lbl_path = ds._cache_paths("train")

print(f"writing {N_TRAIN} x 64x64x3 uint8 cache "
      f"({N_TRAIN * 64 * 64 * 3 / 1e9:.2f} GB) ...")
t0 = time.perf_counter()
arr = np.lib.format.open_memmap(img_path, mode="w+", dtype=np.uint8,
                                shape=(N_TRAIN, 64, 64, 3))
rng = np.random.RandomState(0)
chunk = 8192
for i in range(0, N_TRAIN, chunk):
    j = min(i + chunk, N_TRAIN)
    arr[i:j] = rng.randint(0, 255, (j - i, 64, 64, 3), np.uint8)
arr.flush()
del arr
np.save(lbl_path, rng.randint(0, 2, N_TRAIN).astype(np.int32))
print(f"  cache written in {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
x, y = ds.load_u8("train")
t_load = time.perf_counter() - t0
print(f"load_u8('train'): {x.shape} {x.dtype} in {t_load * 1e3:.1f} ms "
      f"(memmap={isinstance(x, np.memmap)})")

# simulated training access: 100 random minibatches of 128
t0 = time.perf_counter()
total = 0
for i in range(100):
    idx = rng.randint(0, N_TRAIN, 128)
    total += int(x[np.sort(idx)].sum())
t_gather = time.perf_counter() - t0
print(f"100 random 128-image gathers: {t_gather:.2f}s "
      f"({100 * 128 / t_gather:.0f} img/s host-side)")

# full sequential pass (what jnp.asarray does when moving to device)
t0 = time.perf_counter()
s = 0
for i in range(0, N_TRAIN, 65536):
    s += int(x[i:i + 65536].sum(dtype=np.int64))
t_scan = time.perf_counter() - t0
gbps = N_TRAIN * 64 * 64 * 3 / t_scan / 1e9
print(f"full sequential pass: {t_scan:.2f}s ({gbps:.2f} GB/s)")

assert t_load < 1.0, "load must be O(ms)"
shutil.rmtree(root, ignore_errors=True)
print("OK: 162k-image split loads in milliseconds; PASS")
