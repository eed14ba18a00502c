"""EXPERIMENT (measured slower — kept as a record, not shipped):
Pallas projection v3p — v3 with an x-padded grid for full boundary-mask
elision (VERDICT round-2 item 5 / TODO.md #3).

A/B result on the v5e (scripts/pallas_v3p_bench.py, batch 4096):
v3p 1021 (tile 64) / 1005 (tile 128) vs v3 1129 recon/s — eliminating
22 of 24 per-step mask multiplies does NOT pay for +14.3% matmul rows,
the third measured negative lever on the deep kernel (RESULTS.md round
3). Numerics validated (interpret-mode argmin agreement 1.0 vs XLA at
test scale before the kernel was cut from defensegan_tpu/kernels/).

Same space-to-depth formulation as fused_projection_v3.py (see its header
for the layout and index conventions), with ONE structural change: the 7x7
pixel grid is padded to 7x8 with a zero COLUMN (gx = 8). Why that kills
the masks:

  - a 3x3-conv tap in pixel-major row layout is `shift(v, (dy*gx+dx)*T)`;
    the y-boundary is already handled for free (shift() zero-fills the
    array ends), but with gx=7 an x-edge shift WRAPS into the adjacent
    row's pixels, which v3 kills with 12 per-step [rows, C] mask
    multiplies (plus 12 cheap 16-lane ones);
  - with gx=8, the x-neighbor of an edge pixel IS the zero pad column, so
    a wrapped read returns zeros by construction. The only invariant to
    maintain is that pad ROWS of the activations stay zero:
      h0: fc writes explicit zero blocks at pad pixels (bias rows zeroed);
      h1: ONE padmask multiply per step (conv A accumulates real taps
          into pad rows; conv B reads shifts of h1);
      do: ONE cheap [rows, 16] padmask (tanh(o_pad) != 0);
      dh1/dh0: free — the relu gates `where(h{0,1} > 0)` already zero
          pad rows because h0/h1 pad rows are zero.

Cost: rows grow 56/49 = +14.3% (every matmul and shift moves that much
more), in exchange for eliminating 22 of the 24 per-step mask multiplies.
v3 is VPU-bound (RESULTS.md round 2: int8 MXU halving was SLOWER; the
tap-concat packing was slower), so trading MXU rows for VPU mask ops is
the predicted win. Measured A/B on the chip: scripts/pallas_v3p_bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.kernels.fused_projection_v3 import (S2DPack, _tap_offsets,
                                                        pack_s2d)


def _pad_row_mask(gy: int, gx: int) -> np.ndarray:
    """[gy*gx, 1] 1.0 for real pixels (x < gx-1), 0.0 for the pad column."""
    m = np.ones((gy * gx, 1), np.float32)
    for p in range(gy * gx):
        if p % gx == gx - 1:
            m[p, 0] = 0.0
    return m


def _loop_kernel(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, ka_ref, kat_ref,
                 ba_ref, kbp_ref, kbpt_ref, bb_ref, padm_ref, zout_ref,
                 *, rec_iters: int, rec_lr: float, momentum: float,
                 tile: int, c0: int, ca: int, cb: int, g: int,
                 out_dim: int):
    """One tile of T latents: all L steps VMEM-resident, padded-x grid."""
    gx = g + 1
    npix = g * gx                   # padded pixel count (56 for g=7)
    rows = npix * tile
    kdim = z_ref.shape[1]
    w1 = w1_ref[:]                  # [k, g*g*c0] (REAL pixels only)
    w1t = w1t_ref[:]
    ka = ka_ref[:]
    kat = kat_ref[:]
    kbp = kbp_ref[:]
    kbpt = kbpt_ref[:]
    ba = ba_ref[:]
    bb = bb_ref[:]
    b1r = b1r_ref[:]                # [rows, c0] f32, zeros at pad rows
    x = x_ref[:].astype(jnp.float32)  # [rows, cb] pixel-major, pad rows 0
    padm = padm_ref[:]              # [rows, 1] f32
    padm16 = padm.astype(jnp.bfloat16)
    offs = [(dy * gx + dx) * tile for dy, dx in _tap_offsets(g)]

    def shift(v, s):
        """dest row r reads v[r + s]; out-of-range rows are ZERO."""
        if s == 0:
            return v
        z = jnp.zeros((abs(s), v.shape[1]), v.dtype)
        if s > 0:
            return jnp.concatenate([v[s:, :], z], axis=0)
        return jnp.concatenate([z, v[:s, :]], axis=0)

    scale = 2.0 / out_dim
    zeros_blk16 = jnp.zeros((tile, c0), jnp.bfloat16)

    def step(_, carry):
        z, v = carry                          # f32 [T, k]
        zb = z.astype(jnp.bfloat16)

        # ---- fc: per-REAL-pixel block matmuls; pad pixels are zero blocks
        blocks = []
        for p in range(npix):
            y, xx = divmod(p, gx)
            if xx == gx - 1:
                blocks.append(zeros_blk16)
            else:
                pi = y * g + xx
                blocks.append(jnp.dot(
                    zb, w1[:, pi * c0:(pi + 1) * c0],
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16))
        h0 = jnp.concatenate(blocks, axis=0).astype(jnp.float32)
        h0 = jnp.maximum(h0 + b1r, 0.0)       # pad rows: relu(0+0) = 0
        h0b = h0.astype(jnp.bfloat16)

        # ---- conv A fwd: shift + matmul, NO masks (pad column absorbs
        # x-wraps; shift() zero-fill absorbs y-overflow)
        h1 = jnp.zeros((rows, ca), jnp.float32)
        for k in range(9):
            h1 = h1 + jnp.dot(shift(h0b, offs[k]),
                              ka[k * c0:(k + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        # one padmask: real taps accumulate into pad DEST rows, and conv B
        # reads shifts of h1 — pad rows must be zero
        h1 = jnp.maximum(h1 + ba, 0.0) * padm
        h1b = h1.astype(jnp.bfloat16)

        # ---- conv B fwd: one packed matmul, tap slices shifted after
        obb = jnp.dot(h1b, kbp,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o = bb + jnp.zeros((rows, cb), jnp.float32)
        for k in range(9):
            o = o + shift(obb, offs[k])[:, k * cb:(k + 1) * cb]
        # ---- loss grad in s2d space; pad rows forced to zero (cheap:
        # cb = 16 lanes)
        t = jnp.tanh(o)
        do = ((t - x) * (1.0 - t * t) * scale).astype(jnp.bfloat16) * padm16

        # ---- conv B bwd: pack shifted do tap-major, one matmul
        dop = jnp.concatenate([shift(do, -offs[k]) for k in range(9)],
                              axis=1)                         # [rows, 9*cb]
        dh1 = jnp.dot(dop, kbpt, preferred_element_type=jnp.float32)
        # relu gate: h1 pad rows are 0 => dh1 pad rows auto-zeroed
        dh1 = jnp.where(h1 > 0.0, dh1, 0.0).astype(jnp.bfloat16)

        # ---- conv A bwd: matmul first, shift the narrow bf16 result
        dh0 = jnp.zeros((rows, c0), jnp.float32)
        for k in range(9):
            acc = jnp.dot(dh1, kat[k * ca:(k + 1) * ca, :],
                          preferred_element_type=jnp.float32)
            dh0 = dh0 + shift(acc.astype(jnp.bfloat16), -offs[k])
        dh0 = jnp.where(h0 > 0.0, dh0, 0.0).astype(jnp.bfloat16)

        # ---- fc bwd: accumulate dz over REAL pixel blocks
        dz = jnp.zeros((tile, kdim), jnp.float32)
        for p in range(npix):
            y, xx = divmod(p, gx)
            if xx == gx - 1:
                continue
            pi = y * g + xx
            dz = dz + jnp.dot(dh0[p * tile:(p + 1) * tile, :],
                              w1t[pi * c0:(pi + 1) * c0, :],
                              preferred_element_type=jnp.float32)

        v_new = momentum * v + dz
        z_new = z - rec_lr * v_new
        return (z_new, v_new)

    z0 = z_ref[:]
    z_fin, _ = jax.lax.fori_loop(0, rec_iters, step,
                                 (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z_fin


def fused_projection_s2d_padded(pack: S2DPack, x_pm: jnp.ndarray,
                                z0_flat: jnp.ndarray, *, rec_iters: int,
                                rec_lr: float, momentum: float,
                                tile: int = 64,
                                interpret: bool = False) -> jnp.ndarray:
    """Run the L-step loop for all N latents; returns z_final [N, k].

    x_pm: [g*(g+1)*N, cb] images in TANH space, PADDED pixel-major rows
          per tile (pad-column rows zero; see the reconstructor).
    z0_flat: [N, k] float32 initial latents. N % tile must be 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = z0_flat.shape
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    g = pack.grid_hw
    gx = g + 1
    npix = g * gx
    rows = npix * tile

    kernel = functools.partial(
        _loop_kernel, rec_iters=rec_iters, rec_lr=rec_lr, momentum=momentum,
        tile=tile, c0=pack.c0, ca=pack.ca, cb=pack.cb, g=g,
        out_dim=g * g * pack.cb)

    grid = (n // tile,)
    # row-expanded constants: fc bias + pad mask in padded pixel order
    b1_pad = np.zeros((npix, pack.c0), np.float32)
    b1 = np.asarray(pack.b1, np.float32)
    for p in range(npix):
        y, xx = divmod(p, gx)
        if xx < g:
            b1_pad[p] = b1[y * g + xx]
    b1r = jnp.repeat(jnp.asarray(b1_pad), tile, axis=0)     # [rows, c0]
    padm = jnp.repeat(jnp.asarray(_pad_row_mask(g, gx)), tile,
                      axis=0)                               # [rows, 1]

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # z0
            pl.BlockSpec((rows, pack.cb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),           # x (padded pm)
            full(pack.w1), full(pack.w1t), full(b1r),
            full(pack.ka), full(pack.kat), full(pack.ba),
            full(pack.kbp), full(pack.kbpt), full(pack.bb),
            full(padm),
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
             padm)


def make_pallas_s2d_padded_reconstructor(gan, *, rec_rr: int,
                                         rec_iters: int, rec_lr: float,
                                         momentum: float, tile: int = 64,
                                         interpret: bool = False):
    """Jitted f(x, key) -> ReconstructionResult on the padded-x v3p kernel.

    Drop-in for the v3 reconstructor; identical epilogue (XLA s2d apply,
    per-image argmin), only the in-loop kernel layout differs.
    """
    from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                pack_generator)
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    pack = pack_s2d(gan)
    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant="s2d")
    apply_s2d = make_packed_apply(packed)     # flat s2d order
    perm, inv = packed.perm
    z_dim = pack.z_dim
    g = pack.grid_hw
    gx = g + 1
    npix = g * gx
    cb = pack.cb
    image_shape = gan.cfg.image_shape
    # scatter real s2d pixels into the padded grid (pad column stays zero)
    real_to_pad = np.asarray([(p // g) * gx + (p % g)
                              for p in range(g * g)], np.int32)

    @jax.jit
    def run(x: jnp.ndarray, key: jax.Array) -> ReconstructionResult:
        batch = x.shape[0]
        n = batch * rec_rr
        x_tanh = from_image_space(x).reshape(batch, -1)
        x_s2d = x_tanh[:, perm]                       # [B, g*g*cb] s2d flat
        x_rep = jnp.broadcast_to(x_s2d[:, None],
                                 (batch, rec_rr, x_s2d.shape[1]))
        x_rep = x_rep.reshape(n, g * g, cb)
        x_padded = jnp.zeros((n, npix, cb), x_rep.dtype)
        x_padded = x_padded.at[:, real_to_pad, :].set(x_rep)
        # pixel-major rows per tile: [(tile_idx, pixel, t_in_tile), cb]
        x_pm = x_padded.reshape(n // tile, tile, npix, cb)
        x_pm = x_pm.transpose(0, 2, 1, 3).reshape(npix * n, cb)
        z0 = sample_z0(key, batch, rec_rr, z_dim).reshape(n, z_dim)
        z_fin = fused_projection_s2d_padded(
            pack, x_pm, z0, rec_iters=rec_iters, rec_lr=rec_lr,
            momentum=momentum, tile=tile, interpret=interpret)
        # identical XLA epilogue to the v3 reconstructor
        gvals = apply_s2d(z_fin)
        d = (gvals - x_rep.reshape(n, -1)).astype(jnp.float32)
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
