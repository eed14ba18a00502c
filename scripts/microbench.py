#!/usr/bin/env python
"""Projection-step cost decomposition on the real chip.

IMPORTANT: this environment has a ~30ms fixed dispatch+fetch overhead per
jitted call (PJRT tunnel), so every candidate op is timed INSIDE a
lax.scan of K iterations within ONE program, one scalar fetch at the end.

Times (per iteration): flax generator fwd, full projection step (fwd+vjp+
momentum), isolated deconv1 fwd, equivalent-FLOPs pure matmuls. Guides the
Pallas fused-kernel work (defensegan_tpu/kernels).
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
from defensegan_tpu.gan import DefenseGAN

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10240  # batch*restarts
K = 50  # scan iterations per measurement


def timeit_scan(name, body, init_carry, flops_per_iter, reps=3):
    """body: carry -> carry. Times K iterations inside one jitted scan."""

    @jax.jit
    def run(carry):
        def f(c, _):
            return body(c), None
        carry, _ = jax.lax.scan(f, carry, None, length=K)
        return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), carry)

    out = run(init_carry)
    float(jax.tree.leaves(out)[0])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init_carry)
        float(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    per_iter = best / K
    print(f"{name:44s} {per_iter * 1e3:9.3f} ms/iter  "
          f"{flops_per_iter / per_iter / 1e12:7.2f} TF/s")
    return per_iter


def main():
    cfg = load_config("defensegan_tpu/configs/gans/mnist.yml",
                      overrides={"output_dir": "output/gans/mnist"})
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()

    z = jax.random.normal(jax.random.key(0), (N, cfg.latent_dim))
    x = jax.random.uniform(jax.random.key(1), (N, 28, 28, 1)) * 2 - 1
    # true conv flops per gen fwd
    f_fwd = N * (2 * 128 * 6272 + 49 * 128 * 64 * 25 * 2
                 + 196 * 64 * 1 * 25 * 2)

    print(f"batch*restarts N={N}, K={K} scan iters per timing")

    def gen_fwd(zz):
        # keep carry shape: map image back to a z-shaped carry cheaply
        img = gan.gen_apply_tanh(zz)
        return zz + 1e-12 * jnp.sum(img)

    timeit_scan("flax gen fwd", gen_fwd, z, f_fwd)

    def loss(zz):
        return jnp.sum(jnp.mean((gan.gen_apply_tanh(zz) - x) ** 2,
                                axis=(1, 2, 3)))

    def proj_step(carry):
        zz, v = carry
        g = jax.grad(loss)(zz)
        v = 0.7 * v + g
        return zz - 10.0 * v, v

    timeit_scan("flax proj step (fwd+vjp+mom)", proj_step,
                (z, jnp.zeros_like(z)), 2 * f_fwd)

    # isolated deconv1: [N,7,7,128] -> [N,14,14,64]
    h0 = jax.random.normal(jax.random.key(2), (N, 7, 7, 128), jnp.bfloat16)
    k1 = jax.random.normal(jax.random.key(3), (5, 5, 128, 64), jnp.bfloat16)
    f_dc1 = N * 49 * 128 * 64 * 25 * 2

    def dc1(h):
        out = jax.lax.conv_transpose(h, k1, strides=(2, 2), padding="SAME",
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
        return h + 1e-12 * jnp.sum(out).astype(jnp.bfloat16)

    timeit_scan("deconv1 fwd alone", dc1, h0, f_dc1)

    def dc1_grad(h):
        g = jax.grad(lambda hh: jnp.sum(jax.lax.conv_transpose(
            hh, k1, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(
                jnp.float32)))(h)
        return h + 1e-6 * g

    timeit_scan("deconv1 fwd+vjp", dc1_grad, h0, 2 * f_dc1)

    # pure matmul ceiling at the layer-1 phase-matmul shape
    a1 = jax.random.normal(jax.random.key(4), (N * 49, 128), jnp.bfloat16)
    b1 = jax.random.normal(jax.random.key(5), (128, 2304), jnp.bfloat16)

    def mm(a):
        out = jnp.dot(a, b1, preferred_element_type=jnp.float32)
        return a + 1e-12 * jnp.sum(out).astype(jnp.bfloat16)

    timeit_scan("matmul [N*49,128]@[128,2304] bf16", mm, a1,
                2 * N * 49 * 128 * 2304)

    # fc-shaped matmul
    a2 = jax.random.normal(jax.random.key(6), (N, 128), jnp.bfloat16)
    b2 = jax.random.normal(jax.random.key(7), (128, 6272), jnp.bfloat16)

    def mm2(a):
        out = jnp.dot(a, b2, preferred_element_type=jnp.float32)
        return a + 1e-12 * jnp.sum(out).astype(jnp.bfloat16)

    timeit_scan("matmul [N,128]@[128,6272] bf16", mm2, a2,
                2 * N * 128 * 6272)


if __name__ == "__main__":
    main()
