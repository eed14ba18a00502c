#!/usr/bin/env python
"""Deep-kernel experiment: two-subtile ILP inside the v3 step body.

The last untried lever from TODO #3 (after int8 = slower, tap-concat
packing = slower, v3p mask elision = slower): v3's per-step body is a
serial chain fc -> convA -> convB -> bwd; within each conv the 9 tap
chains already give the scheduler MXU/VPU overlap, but the four STAGES
serialize. Processing two independent 32-latent subtiles per 64-row grid
step gives Mosaic two whole independent chains — while subtile A runs a
VPU shift stage, subtile B's matmuls can occupy the MXU.

Layout: x is packed pixel-major at tile=32 granularity; the kernel grid
steps over PAIRS of consecutive 32-blocks, so inside the kernel the two
subtiles are contiguous row ranges (no strided slicing).

A/B protocol identical to scripts/pallas_v3p_bench.py. This is an
experiment script: if the ILP form wins it graduates into
kernels/fused_projection_v3.py, else the negative result is recorded in
RESULTS.md (make-it-win-or-cut).
"""

import functools
import json
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

from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.kernels.fused_projection_v3 import (  # noqa: E402
    S2DPack, _tap_offsets, make_pallas_s2d_reconstructor, pack_s2d)


def _ilp_loop_kernel(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, ka_ref,
                     kat_ref, ba_ref, kbp_ref, kbpt_ref, bb_ref, masks_ref,
                     zout_ref, *, rec_iters, rec_lr, momentum, tile, c0,
                     ca, cb, g, out_dim):
    """Two independent subtiles of `tile` latents per grid step."""
    p2 = g * g
    rows = p2 * tile
    w1 = w1_ref[:]
    w1t = w1t_ref[:]
    ka = ka_ref[:]
    kat = kat_ref[:]
    kbp = kbp_ref[:]
    kbpt = kbpt_ref[:]
    ba = ba_ref[:]
    bb = bb_ref[:]
    b1r = b1r_ref[:]          # [rows, c0] (one subtile's expansion)
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

    def half_grad(z, x):
        """dz for one subtile (identical math to v3's step body)."""
        kdim = z.shape[1]
        zb = z.astype(jnp.bfloat16)
        h0 = jnp.concatenate(
            [jnp.dot(zb, w1[:, p * c0:(p + 1) * c0],
                     preferred_element_type=jnp.float32)
             for p in range(p2)], axis=0)
        h0 = jnp.maximum(h0 + b1r, 0.0)
        h0b = h0.astype(jnp.bfloat16)
        h1 = jnp.zeros((rows, ca), jnp.float32)
        for k in range(9):
            h1 = h1 + jnp.dot(shifted(h0b, k),
                              ka[k * c0:(k + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + ba, 0.0)
        h1b = h1.astype(jnp.bfloat16)
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
        dop = jnp.concatenate([shifted(do, k, -1) for k in range(9)],
                              axis=1)
        dh1 = jnp.dot(dop, kbpt, preferred_element_type=jnp.float32)
        dh1 = jnp.where(h1 > 0.0, dh1, 0.0).astype(jnp.bfloat16)
        dh0 = jnp.zeros((rows, c0), jnp.float32)
        for k in range(9):
            acc = jnp.dot(dh1, kat[k * ca:(k + 1) * ca, :],
                          preferred_element_type=jnp.float32)
            dh0 = dh0 + shifted(acc.astype(jnp.bfloat16), k, -1)
        dh0 = jnp.where(h0 > 0.0, dh0, 0.0).astype(jnp.bfloat16)
        dz = jnp.zeros((tile, kdim), jnp.float32)
        for p in range(p2):
            dz = dz + jnp.dot(dh0[p * tile:(p + 1) * tile, :],
                              w1t[p * c0:(p + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        return dz

    xa = x_ref[:rows, :].astype(jnp.float32)
    xb_ = x_ref[rows:, :].astype(jnp.float32)

    def step(_, carry):
        z, v = carry                       # [2*tile, k]
        za, zb2 = z[:tile, :], z[tile:, :]
        # two independent chains in one basic block — the scheduler is
        # free to interleave subtile B's MXU work with A's VPU stages
        dza = half_grad(za, xa)
        dzb = half_grad(zb2, xb_)
        dz = jnp.concatenate([dza, dzb], axis=0)
        v_new = momentum * v + dz
        z_new = z - rec_lr * v_new
        return (z_new, v_new)

    z0 = z_ref[:]
    z_fin, _ = jax.lax.fori_loop(0, rec_iters, step,
                                 (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z_fin


def make_ilp_reconstructor(gan, *, rec_rr, rec_iters, rec_lr, momentum,
                           tile=32, interpret=False):
    """v3 reconstructor with the two-subtile ILP kernel (grid of 2*tile)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                pack_generator)
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    pack = pack_s2d(gan)
    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant="s2d")
    apply_s2d = make_packed_apply(packed)
    perm, inv = packed.perm
    z_dim = pack.z_dim
    p2 = pack.grid_hw * pack.grid_hw
    cb = pack.cb
    image_shape = gan.cfg.image_shape
    rows = p2 * tile

    kernel = functools.partial(
        _ilp_loop_kernel, rec_iters=rec_iters, rec_lr=rec_lr,
        momentum=momentum, tile=tile, c0=pack.c0, ca=pack.ca, cb=pack.cb,
        g=pack.grid_hw, out_dim=p2 * pack.cb)

    b1r = jnp.repeat(pack.b1, tile, axis=0)
    masks_r = jnp.repeat(pack.masks, tile, axis=0)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, key):
        batch = x.shape[0]
        n = batch * rec_rr
        if n % (2 * tile):
            raise ValueError(f"N={n} not a multiple of {2 * tile}")
        x_tanh = from_image_space(x).reshape(batch, -1)
        x_s2d = x_tanh[:, perm]
        x_rep = jnp.broadcast_to(x_s2d[:, None],
                                 (batch, rec_rr, x_s2d.shape[1]))
        x_rep = x_rep.reshape(n, p2, cb)
        # pixel-major at SUBTILE (=tile) granularity; the kernel grid
        # consumes two consecutive subtile blocks per step
        x_pm = x_rep.reshape(n // tile, tile, p2, cb).transpose(0, 2, 1, 3)
        x_pm = x_pm.reshape(p2 * n, cb)
        z0 = sample_z0(key, batch, rec_rr, z_dim).reshape(n, z_dim)
        f = pl.pallas_call(
            kernel,
            grid=(n // (2 * tile),),
            in_specs=[
                pl.BlockSpec((2 * tile, z_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * rows, cb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(pack.w1), full(pack.w1t), full(b1r),
                full(pack.ka), full(pack.kat), full(pack.ba),
                full(pack.kbp), full(pack.kbpt), full(pack.bb),
                full(masks_r),
            ],
            out_specs=pl.BlockSpec((2 * tile, z_dim), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, z_dim), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        z_fin = f(z0, x_pm.astype(jnp.bfloat16), pack.w1, pack.w1t, b1r,
                  pack.ka, pack.kat, pack.ba, pack.kbp, pack.kbpt, pack.bb,
                  masks_r)
        g = apply_s2d(z_fin)
        d = (g - x_rep.reshape(n, -1)).astype(jnp.float32)
        losses = jnp.mean(jnp.square(d), axis=1).reshape(batch, rec_rr)
        best = jnp.argmin(losses, axis=1)
        z_star = z_fin.reshape(batch, rec_rr, z_dim)[
            jnp.arange(batch), best]
        x_hat = to_image_space(apply_s2d(z_star)[:, inv]).reshape(
            (batch,) + tuple(image_shape))
        loss = losses[jnp.arange(batch), best]
        res = ReconstructionResult(x_hat=x_hat, z_star=z_star, loss=loss,
                                   all_losses=losses)
        return jax.tree.map(jax.lax.stop_gradient, res)

    return run


def bench(run, batch, image_shape, label, repeats=3):
    x = jax.random.uniform(jax.random.key(0), (batch,) + tuple(image_shape),
                           jnp.float32)
    k = jax.random.key(1)
    t0 = time.perf_counter()
    float(jnp.sum(run(x, k).x_hat))
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, jax.random.fold_in(k, i)).x_hat))
        times.append(time.perf_counter() - t0)
    v = batch / min(times)
    print(json.dumps({"metric": label, "recon_per_sec": round(v, 2)}),
          flush=True)
    return v


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist.yml"))
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
    kw = dict(rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters, rec_lr=cfg.rec_lr,
              momentum=cfg.rec_momentum)

    # correctness vs XLA on a small batch
    xs = jax.random.uniform(jax.random.key(7), (64,) + cfg.image_shape,
                            jnp.float32)
    key = jax.random.key(11)
    cfg.projection_kernel = "xla"
    ref = gan.reconstruct(xs, key)
    run_ilp = make_ilp_reconstructor(gan, tile=32, **kw)
    got = run_ilp(xs, key)
    ref_l = np.asarray(ref.all_losses)
    got_l = np.asarray(got.all_losses)
    print(json.dumps({"ilp_vs_xla_argmin_agreement":
                      float((ref_l.argmin(1) == got_l.argmin(1)).mean()),
                      "loss_absdiff_p95": float(np.percentile(
                          np.abs(got_l - ref_l), 95))}), flush=True)

    results = {}
    results["v3_tile64"] = bench(
        make_pallas_s2d_reconstructor(gan, tile=64, **kw), batch,
        cfg.image_shape, f"v3_tile64_batch{batch}")
    results["ilp_2x32"] = bench(run_ilp, batch, cfg.image_shape,
                                f"ilp_2x32_batch{batch}")
    print(json.dumps({"summary": results, "batch": batch}), flush=True)


if __name__ == "__main__":
    main()
