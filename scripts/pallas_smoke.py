#!/usr/bin/env python
"""Pallas kernel TPU smoke: compile, numeric check vs XLA path, quick timing."""

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
from defensegan_tpu.kernels import make_pallas_reconstructor

cfg = load_config("defensegan_tpu/configs/gans/mnist.yml",
                  overrides={"output_dir": "output/gans/mnist"})
gan = DefenseGAN(cfg)
if gan.can_load():
    gan.load()

print("devices:", jax.devices(), flush=True)

# --- tiny smoke: compile + run
t0 = time.time()
run_small = make_pallas_reconstructor(gan, rec_rr=2, rec_iters=5,
                                      rec_lr=10.0, momentum=0.7, tile=32)
x = jax.random.uniform(jax.random.key(0), (16,) + cfg.image_shape)
res = run_small(x, jax.random.key(1))
print("smoke ok", np.asarray(res.x_hat).shape,
      f"compile+run {time.time() - t0:.1f}s", flush=True)

# --- numeric check vs XLA path at L=25, R=2 (same z0 via same key path)
xla_res = gan.reconstruct(x, jax.random.key(2), rec_rr=2, rec_iters=25)
pl_run = make_pallas_reconstructor(gan, rec_rr=2, rec_iters=25,
                                   rec_lr=cfg.rec_lr,
                                   momentum=cfg.rec_momentum, tile=32)
pl_res = pl_run(x, jax.random.key(2))
d_loss = np.abs(np.asarray(xla_res.all_losses)
                - np.asarray(pl_res.all_losses))
d_img = np.abs(np.asarray(xla_res.x_hat) - np.asarray(pl_res.x_hat))
print(f"numeric check: max|dloss|={d_loss.max():.5f} "
      f"max|dimg|={d_img.max():.5f} "
      f"argmin agree={np.mean(np.asarray(xla_res.all_losses).argmin(1) == np.asarray(pl_res.all_losses).argmin(1)):.2f}",
      flush=True)

# --- timing at bench settings
for batch, tile in ((1024, 32), (1024, 64)):
    run = make_pallas_reconstructor(gan, rec_rr=10, rec_iters=200,
                                    rec_lr=10.0, momentum=0.7, tile=tile)
    xb = jax.random.uniform(jax.random.key(3), (batch,) + cfg.image_shape)
    float(jnp.sum(run(xb, jax.random.key(4)).x_hat))  # compile+warm
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(xb, jax.random.fold_in(jax.random.key(5),
                                                 i)).x_hat))
        best = min(best, time.perf_counter() - t0)
    print(f"pallas tile={tile}: {batch / best:.1f} recon/s "
          f"({best * 1e3:.1f} ms)", flush=True)
