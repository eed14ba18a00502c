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

        # packed variants: BN folded; hybrid additionally materializes the
        # final Cout=1 deconv (pathological MXU utilization as a conv) as a
        # dense [12544, 784] matmul
        for variant in ("conv", "phase", "hybrid"):
            apply_flat = make_packed_apply(pack_generator(
                gan.generator, gan.state.gen_params, gan.state.gen_stats,
                variant=variant))

            def packed_loss_flat(zz, apply_flat=apply_flat):
                d = (apply_flat(zz) - x_flat).astype(jnp.float32)
                return jnp.sum(jnp.mean(d * d, axis=1))

            time_step(f"packed {variant} (flat x)",
                      momentum_step(jax.grad(packed_loss_flat)), carry, n)

            for pname, policy in (
                    ("nothing_saveable",
                     jax.checkpoint_policies.nothing_saveable),
                    ("dots_saveable", jax.checkpoint_policies.dots_saveable),
            ):
                apply_r = jax.checkpoint(apply_flat, policy=policy)

                def packed_loss_r(zz, apply_r=apply_r):
                    d = (apply_r(zz) - x_flat).astype(jnp.float32)
                    return jnp.sum(jnp.mean(d * d, axis=1))

                time_step(f"packed {variant} remat {pname}",
                          momentum_step(jax.grad(packed_loss_r)), carry, n)

        # remat variants on the flax apply
        for pname, policy in (
                ("nothing_saveable",
                 jax.checkpoint_policies.nothing_saveable),
                ("dots_saveable", jax.checkpoint_policies.dots_saveable),
        ):
            gen_r = jax.checkpoint(gan.gen_apply_tanh, policy=policy)

            def remat_loss(zz, gen_r=gen_r):
                d = (gen_r(zz) - x_img).astype(jnp.float32)
                return jnp.sum(jnp.mean(d * d, axis=(1, 2, 3)))

            time_step(f"flax remat {pname}",
                      momentum_step(jax.grad(remat_loss)), carry, n)

        if n == 40960:
            # latency-hiding flag experiment marker (set via env at launch)
            pass


if __name__ == "__main__":
    main()
