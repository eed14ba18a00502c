#!/usr/bin/env python
"""Pallas kernel variant sweep on the real chip (each compile ~10-20 min;
run in background). Variants: tap-loop vs factored L1, tile sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from defensegan_tpu.configs import load_config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels import make_pallas_reconstructor

cfg = load_config("defensegan_tpu/configs/gans/mnist.yml",
                  overrides={"output_dir": "output/gans/mnist"})
gan = DefenseGAN(cfg)
if gan.can_load():
    gan.load()

BATCH = 1024
VARIANTS = [
    dict(tile=64, factored_l1=False, vmem_limit_mb=64),
    dict(tile=32, factored_l1=True, vmem_limit_mb=64),
    dict(tile=64, factored_l1=True, vmem_limit_mb=64),
    dict(tile=128, factored_l1=False, vmem_limit_mb=96),
]

x = jax.random.uniform(jax.random.key(0), (BATCH,) + cfg.image_shape)
for v in VARIANTS:
    tag = f"tile={v['tile']} factored={v['factored_l1']}"
    try:
        run = make_pallas_reconstructor(gan, rec_rr=10, rec_iters=200,
                                        rec_lr=10.0, momentum=0.7, **v)
        t0 = time.time()
        float(jnp.sum(run(x, jax.random.key(1)).x_hat))
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(x, jax.random.fold_in(jax.random.key(2),
                                                    i)).x_hat))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {BATCH / best:8.1f} recon/s ({best * 1e3:.0f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
