#!/usr/bin/env python
"""Projection-step cost decomposition on the real chip.

Times: full projection step (fwd+vjp+momentum) for flax vs packed generator,
generator forward alone, and pure-matmul MXU ceilings at equivalent shapes.
Guides the Pallas fused-kernel work (defensegan_tpu/kernels).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from defensegan_tpu.configs import load_config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels import apply_packed, pack_generator

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10240  # batch*restarts


def timeit(name, fn, *args, reps=5, scale=1.0):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best * 1e3:9.3f} ms   "
          f"{scale / best / 1e12:7.2f} TF/s" if scale else
          f"{name:42s} {best * 1e3:9.3f} ms")
    return best


def main():
    cfg = load_config("defensegan_tpu/configs/gans/mnist.yml",
                      overrides={"output_dir": "output/gans/mnist"})
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
    packed = pack_generator(
        gan.generator,
        {"params": gan.state.gen_params, "batch_stats": gan.state.gen_stats},
        dtype=jnp.bfloat16)

    z = jax.random.normal(jax.random.key(0), (N, cfg.latent_dim))
    x = jax.random.uniform(jax.random.key(1), (N, 28, 28, 1)) * 2 - 1

    def flax_apply(z):
        return gan.gen_apply_tanh(z)

    def packed_apply(z):
        return apply_packed(packed, z)

    # FLOPs per gen fwd (true conv flops): fc 2*z*6272 + dc1 49*128*64*25*2
    #  + dc2 196*64*1*25*2
    f_fwd = N * (2 * 128 * 6272 + 49 * 128 * 64 * 25 * 2
                 + 196 * 64 * 1 * 25 * 2)

    print(f"batch*restarts N={N}")
    timeit("flax gen fwd", jax.jit(flax_apply), z, scale=f_fwd)
    timeit("packed gen fwd", jax.jit(packed_apply), z, scale=f_fwd)

    def step(apply_fn):
        def loss(zz):
            return jnp.sum(jnp.mean((apply_fn(zz) - x) ** 2,
                                    axis=(1, 2, 3)))

        def one(zz, v):
            g = jax.grad(loss)(zz)
            v = 0.7 * v + g
            return zz - 10.0 * v, v
        return one

    v0 = jnp.zeros_like(z)
    timeit("flax proj step (fwd+vjp+mom)", jax.jit(step(flax_apply)), z, v0,
           scale=3 * f_fwd)
    timeit("packed proj step (fwd+vjp+mom)", jax.jit(step(packed_apply)), z,
           v0, scale=3 * f_fwd)

    # MXU ceilings at the hot matmul shapes
    a1 = jnp.ones((N * 49, 1152), jnp.bfloat16)
    b1 = jnp.ones((1152, 256), jnp.bfloat16)
    timeit("matmul [N*49,1152]@[1152,256] bf16",
           jax.jit(lambda a, b: jnp.dot(a, b,
                                        preferred_element_type=jnp.float32)),
           a1, b1, scale=2 * N * 49 * 1152 * 256)
    a2 = jnp.ones((N, 128), jnp.bfloat16)
    b2 = jnp.ones((128, 6272), jnp.bfloat16)
    timeit("matmul [N,128]@[128,6272] bf16",
           jax.jit(lambda a, b: jnp.dot(a, b,
                                        preferred_element_type=jnp.float32)),
           a2, b2, scale=2 * N * 128 * 6272)


if __name__ == "__main__":
    main()
