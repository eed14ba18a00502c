#!/usr/bin/env python
"""Pallas v3 fused s2d kernel (deep/dim64 generator) on the real chip:
compile, validate numerics vs the XLA path (argmin agreement), and bench
recon/s against the 1000 target (VERDICT round-1 item 2).

Usage: python scripts/pallas_v3_bench.py [tiles...] (default: 64 128 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import load_config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v3 import (
    make_pallas_s2d_reconstructor)

TILES = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
BATCH = 2048
R, L = 10, 200


def bench(fn, x, key, reps=3):
    t0 = time.perf_counter()
    float(jnp.sum(fn(x, key).x_hat))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        float(jnp.sum(fn(x, k).x_hat))
        best = min(best, time.perf_counter() - t0)
    return x.shape[0] / best, compile_s


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = load_config("defensegan_tpu/configs/gans/mnist.yml")
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print(f"trained weights loaded ({int(gan.state.step)} steps)")

    key = jax.random.key(0)
    x = jax.random.uniform(jax.random.fold_in(key, 99),
                           (BATCH,) + cfg.image_shape, jnp.float32)

    cfg.projection_kernel = "xla"
    recon_s, _ = bench(lambda xx, kk: gan.reconstruct(xx, kk), x, key)
    print(f"xla reconstruct: {recon_s:8.1f} recon/s", flush=True)
    ref = gan.reconstruct(x[:256], jax.random.fold_in(key, 7))
    ref_arg = np.asarray(ref.all_losses).argmin(1)

    for tile in TILES:
        print(f"--- pallas v3 tile={tile}: compiling ...", flush=True)
        try:
            run = make_pallas_s2d_reconstructor(
                gan, rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters,
                rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum, tile=tile)
            recon_s, compile_s = bench(run, x, key)
            got = run(x[:256], jax.random.fold_in(key, 7))
            agree = float(np.mean(
                np.asarray(got.all_losses).argmin(1) == ref_arg))
            loss_diff = float(np.max(np.abs(
                np.asarray(got.all_losses) - np.asarray(ref.all_losses))))
            print(f"pallas v3 tile={tile}: {recon_s:8.1f} recon/s "
                  f"(compile {compile_s:.0f}s, argmin agree {agree:.3f}, "
                  f"max loss diff {loss_diff:.2e})", flush=True)
        except Exception as e:  # keep sweeping other tiles
            print(f"pallas v3 tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
