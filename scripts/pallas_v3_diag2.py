#!/usr/bin/env python
"""Section-by-section bisection of the v3 kernel on the real chip.

Builds the real S2DPack and compiles progressively larger truncations of
the step body (fc -> +convA -> +convB -> +grad -> +convB bwd -> +convA bwd
-> full) at tile=64, rec_iters=1. Mosaic crashes are fast, so this
pinpoints the offending section in a few minutes.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from defensegan_tpu.configs import load_config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v3 import (S2DPack, pack_s2d,
                                                        _tap_offsets)

TILE = 64


def build_kernel(pack: S2DPack, upto: str):
    g = pack.grid_hw
    p2 = g * g
    tile = TILE
    rows = p2 * tile
    c0, ca, cb = pack.c0, pack.ca, pack.cb
    out_dim = p2 * cb

    def kern(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, ka_ref, kat_ref,
             ba_ref, kbp_ref, kbpt_ref, bb_ref, masks_ref, zout_ref):
        kdim = z_ref.shape[1]
        w1 = w1_ref[:]
        w1t = w1t_ref[:]
        ka = ka_ref[:]
        kat = kat_ref[:]
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
            zz = jnp.zeros((abs(s), v.shape[1]), v.dtype)
            if s > 0:
                return jnp.concatenate([v[s:, :], zz], axis=0)
            return jnp.concatenate([zz, v[:s, :]], axis=0)

        m_f32 = [masks_ref[:, k:k + 1] for k in range(9)]
        m_b16 = [m.astype(jnp.bfloat16) for m in m_f32]
        scale = 2.0 / out_dim

        z = z_ref[:]
        v = jnp.zeros_like(z)
        zb = z.astype(jnp.bfloat16)

        h0 = jnp.concatenate(
            [jnp.dot(zb, w1[:, p * c0:(p + 1) * c0],
                     preferred_element_type=jnp.float32)
             for p in range(p2)], axis=0)
        h0 = jnp.maximum(h0 + b1r, 0.0)
        h0b = h0.astype(jnp.bfloat16)
        if upto == "fc":
            zout_ref[:] = z + jnp.sum(h0) * 0.0
            return

        h1 = jnp.zeros((rows, ca), jnp.float32)
        for k in range(9):
            src = shift(h0b, offs[k]) * m_b16[k]
            h1 = h1 + jnp.dot(src, ka[k * c0:(k + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + ba, 0.0)
        h1b = h1.astype(jnp.bfloat16)
        if upto == "convA":
            zout_ref[:] = z + jnp.sum(h1) * 0.0
            return

        ob = jnp.dot(h1b, kbp, preferred_element_type=jnp.float32)
        o = bb + jnp.zeros((rows, cb), jnp.float32)
        for k in range(9):
            part = shift(ob[:, k * cb:(k + 1) * cb], offs[k])
            o = o + part * m_f32[k]
        if upto == "convB":
            zout_ref[:] = z + jnp.sum(o) * 0.0
            return

        t = jnp.tanh(o)
        do = ((t - x) * (1.0 - t * t) * scale).astype(jnp.bfloat16)
        if upto == "grad":
            zout_ref[:] = z + jnp.sum(do.astype(jnp.float32)) * 0.0
            return

        dop = jnp.concatenate(
            [shift(do, -offs[k]) * m_b16[8 - k] for k in range(9)], axis=1)
        dh1 = jnp.dot(dop, kbpt, preferred_element_type=jnp.float32)
        dh1 = jnp.where(h1 > 0.0, dh1, 0.0).astype(jnp.bfloat16)
        if upto == "convB_bwd":
            zout_ref[:] = z + jnp.sum(dh1.astype(jnp.float32)) * 0.0
            return

        dh0 = jnp.zeros((rows, c0), jnp.float32)
        for k in range(9):
            acc = jnp.dot(dh1, kat[k * ca:(k + 1) * ca, :],
                          preferred_element_type=jnp.float32)
            dh0 = dh0 + shift(acc, -offs[k]) * m_f32[8 - k]
        dh0 = jnp.where(h0 > 0.0, dh0, 0.0).astype(jnp.bfloat16)
        if upto == "convA_bwd":
            zout_ref[:] = z + jnp.sum(dh0.astype(jnp.float32)) * 0.0
            return

        dz = jnp.zeros((tile, kdim), jnp.float32)
        for p in range(p2):
            dz = dz + jnp.dot(dh0[p * tile:(p + 1) * tile, :],
                              w1t[p * c0:(p + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        v = 0.7 * v + dz
        zout_ref[:] = z - 10.0 * v

    return kern, rows


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = load_config("defensegan_tpu/configs/gans/mnist.yml")
    gan = DefenseGAN(cfg)
    pack = pack_s2d(gan)
    g = pack.grid_hw
    p2 = g * g
    n = TILE
    rows = p2 * n
    key = jax.random.key(0)
    z0 = jax.random.normal(key, (n, pack.z_dim), jnp.float32)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (rows, pack.cb),
                           jnp.float32)
    b1r = jnp.repeat(pack.b1, TILE, axis=0)
    masks_r = jnp.repeat(pack.masks, TILE, axis=0)

    for upto in ("fc", "convA", "convB", "grad", "convB_bwd", "convA_bwd",
                 "full"):
        kern, _ = build_kernel(pack, upto)
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, pack.z_dim), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            r = float(jnp.sum(f(z0, x.astype(jnp.bfloat16), pack.w1,
                                pack.w1t, b1r, pack.ka, pack.kat, pack.ba,
                                pack.kbp, pack.kbpt, pack.bb, masks_r)))
            print(f"PASS upto={upto}: sum={r:.4e}", flush=True)
        except Exception as e:
            print(f"FAIL upto={upto}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
