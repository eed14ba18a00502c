#!/usr/bin/env python
"""XLA projection-path tuning sweep: scan unroll x batch size."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from defensegan_tpu.configs import load_config
from defensegan_tpu.defense.project import reconstruct, sample_z0
from defensegan_tpu.gan import DefenseGAN

cfg = load_config("defensegan_tpu/configs/gans/mnist.yml",
                  overrides={"output_dir": "output/gans/mnist"})
gan = DefenseGAN(cfg)
if gan.can_load():
    gan.load()

variables = {"params": gan.state.gen_params,
             "batch_stats": gan.state.gen_stats}


def gen_apply(z):
    return gan.generator.apply(variables, z, train=False)


for unroll in (1, 2, 4, 8):
    for batch in (1024, 2048):
        @jax.jit
        def run(x, key, unroll=unroll):
            z0 = sample_z0(key, x.shape[0], 10, cfg.latent_dim)
            return reconstruct(gen_apply, x, z0, rec_iters=200,
                               rec_lr=10.0, momentum=0.7,
                               unroll=unroll).x_hat

        x = jax.random.uniform(jax.random.key(0),
                               (batch,) + cfg.image_shape)
        float(jnp.sum(run(x, jax.random.key(1))))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(x, jax.random.fold_in(jax.random.key(2), i))))
            best = min(best, time.perf_counter() - t0)
        print(f"unroll={unroll} batch={batch}: {batch / best:8.1f} recon/s "
              f"({best * 1e3:.0f} ms)", flush=True)
