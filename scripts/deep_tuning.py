#!/usr/bin/env python
"""Deep-config (reference mnist.yml) projection-step tuning, round 2:
remat policies, image-space packed apply, larger N. Goal: >=1000 recon/s
on the reference-faithful deep/dim64 generator (VERDICT item 2).

Current state: flax step 11.6ms @ N=20480 (878 recon/s), 22.7ms @ 40960
(901). Each step stores h0 [N,6272] and h1 [N,12544] bf16 residuals for
the z-vjp — ~1.5 GB HBM round-trip per step at N=40960. Remat variants
trade that traffic for recompute FLOPs.
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
from defensegan_tpu.defense.fastgen import packed_apply_for, pack_generator, \
    make_packed_apply
from defensegan_tpu.gan import DefenseGAN

K = 50
R, L = 10, 200


def time_step(name, step_fn, carry, n, reps=3):
    @jax.jit
    def run(carry):
        def f(c, _):
            return step_fn(c), None
        carry, _ = jax.lax.scan(f, carry, None, length=K, unroll=8)
        return jnp.sum(carry[0])

    float(run(carry))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(carry))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / K
    print(f"{name:36s} {per_iter * 1e3:8.3f} ms/step   "
          f"implied {(n / R) / (L * per_iter):7.1f} recon/s", flush=True)


def momentum_step(grad_fn):
    def step(carry):
        z, v = carry
        g = grad_fn(z)
        v = 0.7 * v + g
        return (z - 10.0 * v, v)
    return step


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = load_config("defensegan_tpu/configs/gans/mnist.yml")
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print("trained deep weights loaded")

    for n in (40960, 81920):
        kx, kz = jax.random.split(jax.random.key(0))
        x_img = jax.random.uniform(kx, (n, 28, 28, 1), jnp.float32) * 2 - 1
        x_flat = x_img.reshape(n, -1)
        z = jax.random.normal(kz, (n, cfg.latent_dim), jnp.float32)
        carry = (z, jnp.zeros_like(z))
        print(f"--- N={n}")

        # baseline: flax image-space
        def flax_loss(zz):
            d = (gan.gen_apply_tanh(zz) - x_img).astype(jnp.float32)
            return jnp.sum(jnp.mean(d * d, axis=(1, 2, 3)))

        time_step("flax (baseline)", momentum_step(jax.grad(flax_loss)),
                  carry, n)

        # measured 2026-08-16 (N=40960): conv 809, phase 458, hybrid 565,
        # best remat variant 849 — nothing beats the 865 flax baseline, so
        # the sweep now focuses on the s2d rewrite (whole stack as stride-1
        # wide-channel convs on the 7x7 grid, pixel-shuffle folded into a
        # flat permutation outside the loop; MSE is permutation-invariant)
        packed = pack_generator(gan.generator, gan.state.gen_params,
                                gan.state.gen_stats, variant="conv")
        apply_flat = make_packed_apply(packed)

        def packed_loss_flat(zz):
            d = (apply_flat(zz) - x_flat).astype(jnp.float32)
            return jnp.sum(jnp.mean(d * d, axis=1))

        time_step("packed conv (flat x)",
                  momentum_step(jax.grad(packed_loss_flat)), carry, n)

        s2d = pack_generator(gan.generator, gan.state.gen_params,
                             gan.state.gen_stats, variant="s2d")
        apply_s2d = make_packed_apply(s2d)
        x_s2d = x_flat[:, s2d.perm[0]]

        def s2d_loss(zz):
            d = (apply_s2d(zz) - x_s2d).astype(jnp.float32)
            return jnp.sum(jnp.mean(d * d, axis=1))

        for unroll in (8, 16):
            @jax.jit
            def run_s2d(carry, unroll=unroll):
                def f(c, _):
                    return momentum_step(jax.grad(s2d_loss))(c), None
                c, _ = jax.lax.scan(f, carry, None, length=K, unroll=unroll)
                return jnp.sum(c[0])

            import time as _t
            float(run_s2d(carry))
            best = float("inf")
            for _ in range(3):
                t0 = _t.perf_counter()
                float(run_s2d(carry))
                best = min(best, _t.perf_counter() - t0)
            per = best / K
            print(f"{'packed s2d unroll=' + str(unroll):36s} "
                  f"{per * 1e3:8.3f} ms/step   "
                  f"implied {(n / R) / (L * per):7.1f} recon/s", flush=True)


if __name__ == "__main__":
    main()
