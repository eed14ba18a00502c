#!/usr/bin/env python
"""v3 experiment: pack conv A's 9 tap matmuls into ONE wide matmul each way.

Hypothesis (RESULTS.md round 2): v3 is VPU-bound, not MXU-bound. The
shipped kernel issues 9 [rows,128]@[128,256] matmuls + 8 f32 accumulates
for conv A fwd (and 9 + 8 for bwd). This variant concatenates the 9
shifted/masked inputs into [rows, 9*128] and contracts all taps in one
[rows,1152]@[1152,256] matmul (fwd), and packs the bwd the same way with
[rows, 9*256]@[2304,128]. Same shift volume, 16 fewer accumulate passes,
2 matmul launches instead of 18.

CPU interpret check first, then on-chip bench vs the shipped v3.

Run:  python scripts/pallas_v3_packed_exp.py [--cpu]
"""

import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from defensegan_tpu.kernels.fused_projection_v3 import (  # noqa: E402
    S2DPack, _tap_offsets, pack_s2d)


def _loop_kernel_packed(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, kas_ref,
                        kats_ref, ba_ref, kbp_ref, kbpt_ref, bb_ref,
                        masks_ref, zout_ref, *, rec_iters: int,
                        rec_lr: float, momentum: float, tile: int, c0: int,
                        ca: int, cb: int, g: int, out_dim: int):
    """Like fused_projection_v3._loop_kernel but conv A fwd/bwd are single
    packed matmuls over tap-concatenated inputs.

    kas_ref:  [9*c0, ca]  (same layout as v3 `ka` — rows are tap blocks,
              so the packed input's column blocks line up)
    kats_ref: [9*ca, c0]  (same as v3 `kat`)
    """
    p2 = g * g
    rows = p2 * tile
    kdim = z_ref.shape[1]
    w1 = w1_ref[:]
    w1t = w1t_ref[:]
    kas = kas_ref[:]
    kats = kats_ref[:]
    kbp = kbp_ref[:]
    kbpt = kbpt_ref[:]
    ba = ba_ref[:]
    bb = bb_ref[:]
    b1r = b1r_ref[:]
    x = x_ref[:].astype(jnp.float32)
    offs = [(dy * g + dx) * tile for dy, dx in _tap_offsets(g)]

    def shift(v, s):
        if s == 0:
            return v
        z = jnp.zeros((abs(s), v.shape[1]), v.dtype)
        if s > 0:
            return jnp.concatenate([v[s:, :], z], axis=0)
        return jnp.concatenate([z, v[:s, :]], axis=0)

    m_f32 = [masks_ref[:, k:k + 1] for k in range(9)]
    m_b16 = [m.astype(jnp.bfloat16) for m in m_f32]
    no_mask = {k for k, (dy, dx) in enumerate(_tap_offsets(g)) if dx == 0}

    def shifted(v, k, sign=1):
        s = sign * offs[k]
        out = shift(v, s)
        if k in no_mask:
            return out
        m = m_b16 if v.dtype == jnp.bfloat16 else m_f32
        idx = k if sign > 0 else 8 - k
        return out * m[idx]

    scale = 2.0 / out_dim

    def step(_, carry):
        z, v = carry
        zb = z.astype(jnp.bfloat16)

        h0 = jnp.concatenate(
            [jnp.dot(zb, w1[:, p * c0:(p + 1) * c0],
                     preferred_element_type=jnp.float32)
             for p in range(p2)], axis=0)
        h0 = jnp.maximum(h0 + b1r, 0.0)
        h0b = h0.astype(jnp.bfloat16)

        # conv A fwd: ONE packed matmul over tap-concatenated input
        h0cat = jnp.concatenate([shifted(h0b, k) for k in range(9)], axis=1)
        h1 = jnp.dot(h0cat, kas, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + ba, 0.0)
        h1b = h1.astype(jnp.bfloat16)

        # conv B fwd (unchanged from v3)
        obb = jnp.dot(h1b, kbp,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o = bb + jnp.zeros((rows, cb), jnp.float32)
        for k in range(9):
            part = shift(obb, offs[k])[:, k * cb:(k + 1) * cb]
            if k not in no_mask:
                part = part * m_b16[k]
            o = o + part
        t = jnp.tanh(o)
        do = ((t - x) * (1.0 - t * t) * scale).astype(jnp.bfloat16)

        # conv B bwd (unchanged)
        dop = jnp.concatenate([shifted(do, k, -1) for k in range(9)],
                              axis=1)
        dh1 = jnp.dot(dop, kbpt, preferred_element_type=jnp.float32)
        dh1 = jnp.where(h1 > 0.0, dh1, 0.0).astype(jnp.bfloat16)

        # conv A bwd: ONE packed matmul over tap-concatenated shifted dh1
        dh1cat = jnp.concatenate([shifted(dh1, k, -1) for k in range(9)],
                                 axis=1)                    # [rows, 9*ca]
        dh0 = jnp.dot(dh1cat, kats, preferred_element_type=jnp.float32)
        dh0 = jnp.where(h0 > 0.0, dh0, 0.0).astype(jnp.bfloat16)

        dz = jnp.zeros((tile, kdim), jnp.float32)
        for p in range(p2):
            dz = dz + jnp.dot(dh0[p * tile:(p + 1) * tile, :],
                              w1t[p * c0:(p + 1) * c0, :],
                              preferred_element_type=jnp.float32)

        v_new = momentum * v + dz
        z_new = z - rec_lr * v_new
        return (z_new, v_new)

    z0 = z_ref[:]
    z_fin, _ = jax.lax.fori_loop(0, rec_iters, step,
                                 (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z_fin


def run_packed(pack: S2DPack, x_pm, z0_flat, *, rec_iters, rec_lr,
               momentum, tile=64, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = z0_flat.shape
    p2 = pack.grid_hw * pack.grid_hw
    rows = p2 * tile
    kernel = functools.partial(
        _loop_kernel_packed, rec_iters=rec_iters, rec_lr=rec_lr,
        momentum=momentum, tile=tile, c0=pack.c0, ca=pack.ca, cb=pack.cb,
        g=pack.grid_hw, out_dim=p2 * pack.cb)
    grid = (n // tile,)
    b1r = jnp.repeat(pack.b1, tile, axis=0)
    masks_r = jnp.repeat(pack.masks, tile, axis=0)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, pack.cb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(pack.w1), full(pack.w1t), full(b1r),
            full(pack.ka), full(pack.kat), full(pack.ba),
            full(pack.kbp), full(pack.kbpt), full(pack.bb),
            full(masks_r),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return f(z0_flat, x_pm.astype(jnp.bfloat16), pack.w1, pack.w1t, b1r,
             pack.ka, pack.kat, pack.ba, pack.kbp, pack.kbpt, pack.bb,
             masks_r)


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN
    from defensegan_tpu.kernels.fused_projection_v3 import (
        fused_projection_s2d)

    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist.yml"))
    if cpu:
        cfg.gen_dim = 8
        cfg.latent_dim = 32
    gan = DefenseGAN(cfg)
    pack = pack_s2d(gan)

    tile = 8 if cpu else 64
    n = 32 if cpu else 4096 * cfg.rec_rr
    iters = 8 if cpu else cfg.rec_iters
    key = jax.random.key(0)
    z0 = jax.random.normal(key, (n, pack.z_dim), jnp.float32)
    p2 = pack.grid_hw * pack.grid_hw
    x_pm = jax.random.uniform(jax.random.key(1), (p2 * n, pack.cb),
                              jnp.float32, -1.0, 1.0)

    kw = dict(rec_iters=iters, rec_lr=cfg.rec_lr,
              momentum=cfg.rec_momentum, tile=tile, interpret=cpu)
    ref = fused_projection_s2d(pack, x_pm, z0, **kw)
    got = run_packed(pack, x_pm, z0, **kw)
    diff = float(jnp.max(jnp.abs(ref - got)))
    print(f"max |z_fin| diff packed vs v3: {diff:.3e}", flush=True)
    if cpu:
        assert diff < 0.05, diff  # accumulation-order noise amplified by lr=10 momentum dynamics
        print("CPU interpret equivalence OK")
        return

    # on-chip bench, honest host-fetch barrier
    for name, fn in (("v3", fused_projection_s2d), ("packed", run_packed)):
        float(jnp.sum(fn(pack, x_pm, z0, **kw)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(pack, x_pm, z0, **kw)))
            times.append(time.perf_counter() - t0)
        recon_s = (n / cfg.rec_rr) / min(times)
        print(f"{name}: {recon_s:.1f} recon/s", flush=True)


if __name__ == "__main__":
    main()
