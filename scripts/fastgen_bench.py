#!/usr/bin/env python
"""Compare projection-step implementations on the real TPU chip.

Variants (defense/fastgen.py): flax (round-1 shipped path), packed conv
(BN folded), packed phase (deconv -> 4 stride-1 convs + pixel shuffle),
packed dense (wide arch only: whole generator = 2 matmuls).

Timing: K scan iterations inside ONE program, scalar host fetch as the
barrier (the axon tunnel's block_until_ready returns at enqueue; see
CLAUDE.md). Also reports implied recon/s at R=10, L=200.

Run: python scripts/fastgen_bench.py [N_total] (default 20480 = batch 2048 x R 10)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from defensegan_tpu.configs import load_config
from defensegan_tpu.defense.fastgen import packed_apply_for
from defensegan_tpu.gan import DefenseGAN

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
K = 50
R, L = 10, 200


def time_step(name, gen_apply, x_flat, z, unroll=8, reps=3, bf16_loss=False):
    """One projection step (fwd+vjp+momentum) timed inside a scan."""

    if bf16_loss:
        x16 = x_flat.astype(jnp.bfloat16)

        def loss(zz):
            d = gen_apply(zz).astype(jnp.bfloat16) - x16
            return jnp.sum(jnp.mean(jnp.square(d).astype(jnp.float32),
                                    axis=1))
    else:
        def loss(zz):
            d = (gen_apply(zz) - x_flat).astype(jnp.float32)
            return jnp.sum(jnp.mean(jnp.square(d), axis=1))

    grad = jax.grad(loss)

    @jax.jit
    def run(z):
        def step(carry, _):
            zz, v = carry
            g = grad(zz)
            v = 0.7 * v + g
            return (zz - 10.0 * v, v), None
        (zf, _), _ = jax.lax.scan(step, (z, jnp.zeros_like(z)), None,
                                  length=K, unroll=unroll)
        return jnp.sum(zf)

    float(run(z))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(z))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / K
    recon_s = (z.shape[0] / R) / (L * per_iter)
    print(f"{name:28s} {per_iter * 1e3:8.3f} ms/step   "
          f"implied {recon_s:7.1f} recon/s", flush=True)
    return recon_s


def bench_config(cfg_path, label, variants, unrolls=(8,), n=N,
                 include_flax=True, bf16_variants=()):
    cfg = load_config(cfg_path)
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print(f"[{label}] trained weights loaded from {cfg.output_dir}")
    kx, kz = jax.random.split(jax.random.key(0))
    x = jax.random.uniform(kx, (n, 28 * 28), jnp.float32) * 2 - 1
    z = jax.random.normal(kz, (n, cfg.latent_dim), jnp.float32)

    def flax_flat(zz):
        return gan.gen_apply_tanh(zz).reshape(zz.shape[0], -1)

    applies = {"flax": flax_flat} if include_flax else {}
    for v in variants:
        applies[v] = packed_apply_for(gan, variant=v)
    for unroll in unrolls:
        print(f"[{label}] N={n} unroll={unroll}")
        for name, fn in applies.items():
            time_step(f"  {name}", fn, x, z, unroll=unroll)
            if name in bf16_variants:
                time_step(f"  {name}+bf16loss", fn, x, z, unroll=unroll,
                          bf16_loss=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_config("defensegan_tpu/configs/gans/mnist.yml", "deep/dim64",
                 variants=("hybrid",), unrolls=(8,),
                 bf16_variants=("flax", "hybrid"))
    bench_config("defensegan_tpu/configs/gans/mnist.yml", "deep/dim64",
                 variants=("hybrid",), unrolls=(8,), n=40960,
                 include_flax=True)
    bench_config("defensegan_tpu/configs/gans/mnist_fast.yml", "wide/dim16",
                 variants=("conv", "hybrid"), unrolls=(8,),
                 include_flax=False, bf16_variants=("conv",))
    bench_config("defensegan_tpu/configs/gans/mnist_fast.yml", "wide/dim16",
                 variants=("conv",), unrolls=(8,), n=40960,
                 include_flax=False)


if __name__ == "__main__":
    main()
