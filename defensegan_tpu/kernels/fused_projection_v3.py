"""Pallas TPU fused projection v3: the deep two-deconv generator.

Covers the reference-faithful deep topology (configs/gans/mnist.yml:
z[128] -> fc -> 7x7x128 -> deconv 5x5/2 -> 14x14x64 -> deconv 5x5/2 ->
28x28x1; reference: models/gan.py::generator_fn of kabkabm/defensegan) and
runs the whole R x L momentum-GD projection loop VMEM-resident, like the v2
wide kernel (fused_projection_v2.py).

Why a new kernel: XLA plateaus at ~870 recon/s on this topology (RESULTS.md
round-2 sweep: conv/phase/hybrid/s2d packed variants, remat policies, big
batches all land 770-870 vs the 1000 target), and the round-1 v1 kernel was
relayout/latency-bound. v3 eliminates both bottlenecks by construction:

  - the generator is packed in SPACE-TO-DEPTH form (defense/fastgen.py
    variant="s2d"): both stride-2 deconvs become stride-1 3x3 convs on the
    constant 7x7 grid with wide channels (128 -> 4*64 -> 16*1), the pixel
    un-shuffle is a flat permutation OUTSIDE the loop, and MSE is
    permutation-invariant so the loop never leaves s2d space;
  - activations live in PIXEL-MAJOR row layout [49*T, C] (row = pixel*T +
    latent, lanes = channels), so a 3x3-conv tap is a MATMUL plus a static
    row shift (slice + zero concat) with a precomputed 0/1 row mask for
    the grid boundary. Shifting commutes with row-wise matmul, so the
    narrower operand is always the one shifted;
  - the second conv's 16 output channels (pathological MXU lane use) are
    packed tap-major into one [256, 144] matmul, sliced and shifted on
    the VPU afterwards;
  - everything (z, v, h0, h1, weights, masks, x) stays in VMEM across all
    L steps: HBM traffic per tile = read z0/x once + write z_final once.

Per-step MXU work (T=128): fc 49+49 passes, conv A 882+882, conv B 196+196
=> ~74 MF-equiv per latent-step; at the v2 kernel's measured ~90% MXU
efficiency that is ~1200 recon/s on one v5e chip.

Measured optimum (rounds 2-3, RESULTS.md): the shipped form's ~1130
recon/s is a bound established by four independent negative experiments —
int8 MXU matmuls 921 (VPU-bound, not MXU-bound), tap-concat packing 1043,
x-padded mask elision (v3p) 1021, and two-subtile ILP 1122 (tie; Mosaic
already extracts the tap-level overlap). Each lever was built, validated,
measured, and cut; the losing variants live under scripts/ as records.

Index conventions (g = 7, T = tile):
  row r = pixel * T + t encodes (pixel=(y, x), latent t).
  tap k = (dy+1)*3 + (dx+1), offset off_k = (dy*g + dx) * T.
  conv fwd:  out[p] += in[p + off_k] @ W_k   (valid iff pixel p+off in grid)
  conv bwd:  din[p] += dout[p - off_k] @ W_k^T  (valid iff p-off in grid,
             which is tap 8-k's validity mask: the offsets list is
             symmetric under negation).
  shift(v, s)[r] == v[r + s] (zeros out of range), so "read p + off" =
  shift by +off; cross-boundary rows are zeroed by the tap masks.

The restart-selection epilogue (final losses, per-image argmin, G(z*)) runs
outside the kernel through the identical XLA s2d apply, so selection
semantics match defense/project.py exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class S2DPack(NamedTuple):
    """Dense tensors for the kernel, all derived from the s2d packing."""

    w1: jnp.ndarray      # [k, 49*c0] bf16, fc (BN folded), flat (y,x,c)
    w1t: jnp.ndarray     # [49*c0, k] bf16
    b1: jnp.ndarray      # [49, c0] f32 (per-pixel rows of the folded bias)
    ka: jnp.ndarray      # [9*c0, ca] bf16, conv A taps stacked on rows
    kat: jnp.ndarray     # [9*ca, c0] bf16, per-tap transposes stacked
    ba: jnp.ndarray      # [1, ca] f32
    kbp: jnp.ndarray     # [ca, 9*cb] bf16, conv B taps packed on lanes
    kbpt: jnp.ndarray    # [9*cb, ca] bf16
    bb: jnp.ndarray      # [1, cb] f32
    masks: jnp.ndarray   # [49, 9] f32 0/1: valid(pixel + off_k in grid)
    c0: int              # fc channels (128)
    ca: int              # conv A output channels (256)
    cb: int              # conv B output channels (16)
    grid_hw: int         # 7
    z_dim: int


def _tap_offsets(g: int):
    """Pixel offsets of a 3x3 SAME conv, index k = (dy+1)*3 + (dx+1)."""
    return [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _tap_masks(g: int) -> np.ndarray:
    """[g*g, 9] validity of reading pixel p + off_k (inside the grid)."""
    m = np.zeros((g * g, 9), np.float32)
    for p in range(g * g):
        y, x = divmod(p, g)
        for k, (dy, dx) in enumerate(_tap_offsets(g)):
            m[p, k] = float(0 <= y + dy < g and 0 <= x + dx < g)
    return m


def pack_s2d(gan) -> S2DPack:
    """Pack the gan's frozen deep generator for the v3 kernel."""
    from defensegan_tpu.defense.fastgen import pack_generator

    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant="s2d")
    g = packed.base_hw
    (ka_, ba_, _), (kb_, bb_, _) = packed.convs  # [3,3,ci,co] kernels
    ka_ = np.asarray(ka_, np.float32)
    kb_ = np.asarray(kb_, np.float32)
    c0 = ka_.shape[2]
    ca = ka_.shape[3]
    cb = kb_.shape[3]
    offsets = _tap_offsets(g)
    ka = np.concatenate([ka_[dy + 1, dx + 1] for dy, dx in offsets], axis=0)
    kat = np.concatenate([ka_[dy + 1, dx + 1].T for dy, dx in offsets],
                         axis=0)
    kbp = np.concatenate([kb_[dy + 1, dx + 1] for dy, dx in offsets], axis=1)
    kbpt = np.concatenate([kb_[dy + 1, dx + 1].T for dy, dx in offsets],
                          axis=0)
    w1 = np.asarray(packed.w_fc, np.float32)       # [k, g*g*c0]
    b1 = np.asarray(packed.b_fc, np.float32).reshape(g * g, c0)
    return S2DPack(
        w1=jnp.asarray(w1, jnp.bfloat16),
        w1t=jnp.asarray(w1.T.copy(), jnp.bfloat16),
        b1=jnp.asarray(b1, jnp.float32),
        ka=jnp.asarray(ka, jnp.bfloat16),
        kat=jnp.asarray(kat, jnp.bfloat16),
        ba=jnp.asarray(np.asarray(ba_, np.float32)[None, :], jnp.float32),
        kbp=jnp.asarray(kbp, jnp.bfloat16),
        kbpt=jnp.asarray(kbpt, jnp.bfloat16),
        bb=jnp.asarray(np.asarray(bb_, np.float32)[None, :], jnp.float32),
        masks=jnp.asarray(_tap_masks(g), jnp.float32),
        c0=c0, ca=ca, cb=cb, grid_hw=g, z_dim=w1.shape[0],
    )


def _loop_kernel(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, ka_ref, kat_ref,
                 ba_ref, kbp_ref, kbpt_ref, bb_ref, masks_ref, zout_ref,
                 *, rec_iters: int, rec_lr: float, momentum: float,
                 tile: int, c0: int, ca: int, cb: int, g: int,
                 out_dim: int):
    """One tile of T latents: all L steps VMEM-resident."""
    p2 = g * g
    rows = p2 * tile
    kdim = z_ref.shape[1]
    w1 = w1_ref[:]            # [k, p2*c0]
    w1t = w1t_ref[:]          # [p2*c0, k]
    ka = ka_ref[:]
    kat = kat_ref[:]
    kbp = kbp_ref[:]
    kbpt = kbpt_ref[:]
    ba = ba_ref[:]
    bb = bb_ref[:]
    b1r = b1r_ref[:]          # [rows, c0] f32, fc bias expanded to rows
    x = x_ref[:].astype(jnp.float32)          # [rows, cb] (pixel-major)
    offs = [(dy * g + dx) * tile for dy, dx in _tap_offsets(g)]

    def shift(v, s):
        """dest row r reads v[r + s]; out-of-range rows are ZERO.

        pltpu.roll crashes this Mosaic toolchain (scripts/pallas_v3_diag.py
        bisection), so shifts are static slices + zero concat — equivalent
        here because every cross-boundary row is killed by the tap masks.
        """
        if s == 0:
            return v
        z = jnp.zeros((abs(s), v.shape[1]), v.dtype)
        if s > 0:
            return jnp.concatenate([v[s:, :], z], axis=0)
        return jnp.concatenate([z, v[:s, :]], axis=0)

    m_f32 = [masks_ref[:, k:k + 1] for k in range(9)]          # [rows, 1]
    m_b16 = [m.astype(jnp.bfloat16) for m in m_f32]
    # pure-y taps (dx == 0) never wrap a row across the x edge, and shift()
    # zero-fills the array ends — no mask needed; the center tap (k == 4)
    # needs neither shift nor mask
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
        z, v = carry                          # f32 [T, k]
        zb = z.astype(jnp.bfloat16)

        # ---- fc: per-pixel block matmuls into pixel-major rows
        h0 = jnp.concatenate(
            [jnp.dot(zb, w1[:, p * c0:(p + 1) * c0],
                     preferred_element_type=jnp.float32)
             for p in range(p2)], axis=0)
        h0 = jnp.maximum(h0 + b1r, 0.0)
        h0b = h0.astype(jnp.bfloat16)

        # ---- conv A fwd: shift the narrow input, mask, matmul, accumulate
        h1 = jnp.zeros((rows, ca), jnp.float32)
        for k in range(9):
            h1 = h1 + jnp.dot(shifted(h0b, k),
                              ka[k * c0:(k + 1) * c0, :],
                              preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + ba, 0.0)
        h1b = h1.astype(jnp.bfloat16)

        # ---- conv B fwd: one packed matmul, tap slices shifted after.
        # Shift the full (bf16, halves the moved bytes) matmul result and
        # slice after: shifting a 16-lane slice of a matmul result crashes
        # this Mosaic toolchain (scripts/pallas_v3_diag*.py bisections).
        obb = jnp.dot(h1b, kbp,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o = bb + jnp.zeros((rows, cb), jnp.float32)
        for k in range(9):
            part = shift(obb, offs[k])[:, k * cb:(k + 1) * cb]
            if k not in no_mask:
                part = part * m_b16[k]
            o = o + part
        # ---- loss grad in s2d space
        t = jnp.tanh(o)
        do = ((t - x) * (1.0 - t * t) * scale).astype(jnp.bfloat16)

        # ---- conv B bwd: pack shifted do tap-major, one matmul
        dop = jnp.concatenate([shifted(do, k, -1) for k in range(9)],
                              axis=1)                         # [rows, 9*cb]
        dh1 = jnp.dot(dop, kbpt, preferred_element_type=jnp.float32)
        dh1 = jnp.where(h1 > 0.0, dh1, 0.0).astype(jnp.bfloat16)

        # ---- conv A bwd: matmul first, shift the narrow bf16 result
        dh0 = jnp.zeros((rows, c0), jnp.float32)
        for k in range(9):
            acc = jnp.dot(dh1, kat[k * ca:(k + 1) * ca, :],
                          preferred_element_type=jnp.float32)
            dh0 = dh0 + shifted(acc.astype(jnp.bfloat16), k, -1)
        dh0 = jnp.where(h0 > 0.0, dh0, 0.0).astype(jnp.bfloat16)

        # ---- fc bwd: accumulate dz over pixel blocks (static slices)
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


def fused_projection_s2d(pack: S2DPack, x_pm: jnp.ndarray,
                         z0_flat: jnp.ndarray, *, rec_iters: int,
                         rec_lr: float, momentum: float, tile: int = 128,
                         interpret: bool = False) -> jnp.ndarray:
    """Run the L-step loop for all N latents; returns z_final [N, k].

    x_pm: [49*N, cb] images in TANH space, PIXEL-MAJOR s2d rows per tile
          (see make_pallas_s2d_reconstructor for the transform).
    z0_flat: [N, k] float32 initial latents. N % tile must be 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = z0_flat.shape
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    p2 = pack.grid_hw * pack.grid_hw
    rows = p2 * tile

    kernel = functools.partial(
        _loop_kernel, rec_iters=rec_iters, rec_lr=rec_lr, momentum=momentum,
        tile=tile, c0=pack.c0, ca=pack.ca, cb=pack.cb, g=pack.grid_hw,
        out_dim=p2 * pack.cb)

    grid = (n // tile,)
    # row-expanded constants (per-pixel value repeated across the T latents
    # of each pixel block) — built in XLA once, not per kernel step
    b1r = jnp.repeat(pack.b1, tile, axis=0)              # [rows, c0]
    masks_r = jnp.repeat(pack.masks, tile, axis=0)       # [rows, 9]

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
                         memory_space=pltpu.VMEM),           # x (pixel-major)
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


def make_pallas_s2d_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                                  rec_lr: float, momentum: float,
                                  tile: int = 128, interpret: bool = False):
    """Jitted f(x, key, z0=None) -> ReconstructionResult on the fused s2d
    kernel.

    Drop-in for DefenseGAN.reconstruct (back_prop=False) on two-deconv deep
    generators. Restart selection and G(z*) run in XLA on the same s2d
    pack, so argmin semantics are identical to defense/project.py. z0
    ([B, R, k]) overrides the internal N(0, I) sampling (see
    fused_projection_v2.py::make_pallas_dense_reconstructor).
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
    p2 = pack.grid_hw * pack.grid_hw
    cb = pack.cb
    image_shape = gan.cfg.image_shape

    @jax.jit
    def run(x: jnp.ndarray, key: jax.Array,
            z0: jnp.ndarray = None) -> ReconstructionResult:
        batch = x.shape[0]
        n = batch * rec_rr
        x_tanh = from_image_space(x).reshape(batch, -1)
        x_s2d = x_tanh[:, perm]                       # [B, p2*cb] s2d flat
        x_rep = jnp.broadcast_to(x_s2d[:, None],
                                 (batch, rec_rr, x_s2d.shape[1]))
        x_rep = x_rep.reshape(n, p2, cb)
        # pixel-major rows per tile: [(tile_idx, pixel, t_in_tile), cb]
        x_pm = x_rep.reshape(n // tile, tile, p2, cb).transpose(0, 2, 1, 3)
        x_pm = x_pm.reshape(p2 * n, cb)
        if z0 is None:
            z0 = sample_z0(key, batch, rec_rr, z_dim)
        z0 = z0.reshape(n, z_dim)
        z_fin = fused_projection_s2d(
            pack, x_pm, z0, rec_iters=rec_iters, rec_lr=rec_lr,
            momentum=momentum, tile=tile, interpret=interpret)
        # final losses + argmin restart + G(z*): identical XLA epilogue to
        # defense/project.py::reconstruct (in s2d space; MSE is perm-inv)
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


def s2d_kernel_available(gan) -> bool:
    """v3 kernel covers two-deconv deep generators (e.g. MNIST 7->14->28)
    up to channels[0] <= 256 (dim <= 128): the space-to-depth tap weights
    and the [tile, 49*C] row blocks must stay VMEM-resident across all L
    steps; the kernel is validated at the reference's dim=64 and the
    VMEM budget has ~2x headroom, not unbounded."""
    gen = gan.generator
    return len(gen.channels) == 2 and gen.channels[0] <= 256
