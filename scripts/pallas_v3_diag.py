#!/usr/bin/env python
"""Bisect which v3-kernel construct crashes the Mosaic compiler.

Each case compiles a micro-kernel using one more construct from
kernels/fused_projection_v3.py. Compile failures here are fast (~5 s), so
this isolates the offender cheaply before any kernel redesign.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128
G = 7
P2 = G * G
ROWS = P2 * T
C0 = 128
CA = 256
CB = 16


def run_case(name, kernel, in_shapes, out_shape):
    try:
        args = [jnp.asarray(np.random.RandomState(i).randn(*s[0])
                            .astype(s[1])) for i, s in enumerate(in_shapes)]
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in in_shapes],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        r = float(jnp.sum(f(*args)))
        print(f"PASS {name}: sum={r:.3e}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bf = jnp.bfloat16

    # 1. plain matmul
    def k1(a, b, o):
        o[:] = jnp.dot(a[:], b[:], preferred_element_type=jnp.float32)
    run_case("matmul", k1, [((ROWS, C0), bf), ((C0, CA), bf)],
             ((ROWS, CA), jnp.float32))

    # 2. concatenate 49 blocks on sublanes
    def k2(z, w, o):
        blocks = [jnp.dot(z[:], w[:, p * C0:(p + 1) * C0],
                          preferred_element_type=jnp.float32)
                  for p in range(P2)]
        o[:] = jnp.concatenate(blocks, axis=0)
    run_case("concat-sublanes-49", k2,
             [((T, C0), bf), ((C0, P2 * C0), bf)],
             ((ROWS, C0), jnp.float32))

    # 3. pltpu.roll on a bf16 [ROWS, C0]
    def k3(a, o):
        o[:] = pltpu.roll(a[:], (ROWS - 7 * T) % ROWS, 0).astype(jnp.float32)
    run_case("roll-bf16", k3, [((ROWS, C0), bf)], ((ROWS, C0), jnp.float32))

    # 4. lane-1 slice of [ROWS, 9] broadcast-multiplied
    def k4(a, m, o):
        o[:] = a[:] * m[:, 3:4]
    run_case("mask-lane-slice", k4,
             [((ROWS, C0), jnp.float32), ((ROWS, 9), jnp.float32)],
             ((ROWS, C0), jnp.float32))

    # 5. concat 9 x [ROWS, 16] on lanes
    def k5(a, o):
        parts = [pltpu.roll(a[:], (k * T) % ROWS, 0) for k in range(9)]
        o[:] = jnp.concatenate(parts, axis=1)
    run_case("concat-lanes-9x16", k5, [((ROWS, CB), bf)],
             ((ROWS, 9 * CB), bf))

    # 6. narrow [ROWS, 16] elementwise chain (tanh etc)
    def k6(a, b, o):
        t = jnp.tanh(a[:].astype(jnp.float32))
        o[:] = (t - b[:].astype(jnp.float32)) * (1 - t * t) * (2.0 / 784)
    run_case("narrow-elementwise", k6,
             [((ROWS, CB), jnp.float32), ((ROWS, CB), bf)],
             ((ROWS, CB), jnp.float32))

    # 7. fori_loop with roll+matmul inside
    def k7(a, b, o):
        def body(_, acc):
            src = pltpu.roll(acc.astype(jnp.bfloat16), T, 0)
            return jnp.dot(src, b[:], preferred_element_type=jnp.float32)
        o[:] = jax.lax.fori_loop(0, 4, body, a[:].astype(jnp.float32))
    run_case("fori-roll-matmul", k7,
             [((ROWS, C0), jnp.float32), ((C0, C0), bf)],
             ((ROWS, C0), jnp.float32))

    # ---- pltpu.roll crashes this toolchain; candidate replacements ----
    def shift_rows(v, s):
        if s == 0:
            return v
        z = jnp.zeros((abs(s), v.shape[1]), v.dtype)
        if s > 0:
            return jnp.concatenate([v[s:, :], z], axis=0)
        return jnp.concatenate([z, v[:s, :]], axis=0)

    # 8. shift via static slice + zero concat (both directions)
    def k8(a, o):
        o[:] = (shift_rows(a[:], 8 * T).astype(jnp.float32)
                + shift_rows(a[:], -6 * T).astype(jnp.float32))
    run_case("shift-slice-concat", k8, [((ROWS, C0), bf)],
             ((ROWS, C0), jnp.float32))

    # 9. lane-concat 9 x [ROWS, 16] (no rolls at all)
    def k9(a, o):
        o[:] = jnp.concatenate([a[:] for _ in range(9)], axis=1)
    run_case("concat-lanes-norolls", k9, [((ROWS, CB), bf)],
             ((ROWS, 9 * CB), bf))

    # 10. fori_loop with shift+matmul (the v3 inner pattern, roll-free)
    def k10(a, b, o):
        def body(_, acc):
            src = shift_rows(acc.astype(jnp.bfloat16), T)
            return jnp.dot(src, b[:], preferred_element_type=jnp.float32)
        o[:] = jax.lax.fori_loop(0, 4, body, a[:].astype(jnp.float32))
    run_case("fori-shift-matmul", k10,
             [((ROWS, C0), jnp.float32), ((C0, C0), bf)],
             ((ROWS, C0), jnp.float32))


if __name__ == "__main__":
    main()
