"""Pallas TPU fused projection kernel: the ENTIRE R x L defense loop on-chip.

The hot path of Defense-GAN (reference: models/gan.py::reconstruct,
SURVEY.md sections 3.2/3.5) runs the frozen generator and its z-gradient
L=200 times per restart. The XLA path (defense/project.py) is compute-capable
but HBM-bound: every step round-trips all activations through HBM. This
kernel keeps EVERYTHING resident on-chip across all L steps:

  - z, v (momentum) live in the fori_loop carry (VMEM);
  - generator weights are VMEM-resident, BatchNorm folded (matmul_generator
    packing), conv-transposes phase-decomposed into tap matmuls;
  - all activations are per-iteration VMEM values — zero HBM traffic inside
    the loop;
  - images live in a nested-phase layout [N*49, 16] (base 7x7 grid rows,
    (py,px,qy,qx) sub-pixel columns) so neither depth-to-space transposes
    nor reshapes are ever materialized: both upsampling layers are
    (static-roll + mask + matmul) on the SAME row space.

Topology covered: the MNIST-family generator (base 7 -> 14 -> 28, channels
(C0, C1), 1 output channel). The CelebA/ImageNet-64 topology falls back to
the XLA path (projection_kernel_available checks).

Index algebra (also used by matmul_generator, tested against flax exactly):
stride-2 SAME conv-transpose with kernel k: out[2i+p] = sum_a in[i+a]*K[dy],
dy = pad_lo - p + 2a, pad_lo = ceil((k+2-2)/2) = 3 for k=5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.models.generator import Generator

EPS = 1e-5  # flax BatchNorm epsilon


# --------------------------------------------------------------------------
# host-side packing
# --------------------------------------------------------------------------

class PallasGenPack(NamedTuple):
    fc_w2: jnp.ndarray    # [z_dim, 49*C0] bf16, BN folded
    fc_w2T: jnp.ndarray   # [49*C0, z_dim] bf16
    fc_b: jnp.ndarray     # [1, 49*C0] f32
    w1: jnp.ndarray       # [9, C0, 4*C1] bf16, tap-major phase-packed
    w1_all: jnp.ndarray   # [C0, 9*4*C1] bf16 (block t = w1[t])
    w1_allT: jnp.ndarray  # [4*C1, 9*C0] bf16 (block t = w1[t]^T)
    b1: jnp.ndarray       # [1, 1, 4*C1] f32
    w2_all: jnp.ndarray   # [4*C1, 9*16] bf16
    w2_allT: jnp.ndarray  # [9*16, 4*C1] bf16
    b2: jnp.ndarray       # [1, 1, 16] f32
    hw: int               # base grid (7)
    z_dim: int
    c0: int
    c1: int


def _bn_fold(p, s):
    scale = p["scale"] / np.sqrt(s["var"] + EPS)
    return scale, p["bias"] - s["mean"] * scale


def _pad_lo(k: int, s: int = 2) -> int:
    return k - 1 if s > k - 1 else int(np.ceil((k + s - 2) / 2))


def pack_for_pallas(gen: Generator, variables: dict,
                    dtype=jnp.bfloat16) -> PallasGenPack:
    """Fold BN + tap-decompose both conv-transposes (host, once/ckpt)."""
    if gen.base_hw != 7 or len(gen.channels) != 2 or gen.out_channels != 1:
        raise NotImplementedError(
            "pallas projection kernel covers the MNIST-family topology")
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    c0, c1 = gen.channels
    k = gen.kernel
    pad = _pad_lo(k)
    hw = gen.base_hw

    # fc + bn_in (channel fastest-varying in the 49*C0 flat layout)
    s, t = _bn_fold(params["bn_in"], stats["bn_in"])
    fc_w = params["fc_in"]["kernel"] * np.tile(s, hw * hw)[None, :]
    fc_b = params["fc_in"]["bias"] * np.tile(s, hw * hw) + np.tile(t, hw * hw)
    z_dim = fc_w.shape[0]
    fc_w2 = fc_w                       # [z, 49*C0]
    fc_b2 = fc_b.reshape(1, hw * hw * c0)

    # layer 1: taps over the 7-grid, output phases (py, px)
    s, t = _bn_fold(params["bn_0"], stats["bn_0"])
    k1 = params["deconv_0"]["kernel"] * s[None, None, None, :]  # [k,k,C0,C1]
    b1_raw = params["deconv_0"]["bias"] * s + t                 # [C1]
    w1 = np.zeros((3, 3, c0, 2, 2, c1), np.float32)
    for py in range(2):
        for px in range(2):
            for ay in (-1, 0, 1):
                dy = pad - py + 2 * ay
                if not 0 <= dy < k:
                    continue
                for ax in (-1, 0, 1):
                    dx = pad - px + 2 * ax
                    if not 0 <= dx < k:
                        continue
                    w1[ay + 1, ax + 1, :, py, px, :] = k1[dy, dx]
    w1_taps = w1.reshape(9, c0, 4 * c1)
    w1_allT = np.concatenate([w1_taps[t0].T for t0 in range(9)],
                             axis=1)                            # [4C1, 9*C0]
    w1_all = np.concatenate([w1_taps[t0] for t0 in range(9)],
                            axis=1)                             # [C0, 9*4C1]
    b1 = np.tile(b1_raw, 4).reshape(1, 1, 4 * c1)

    # layer 2 in nested-phase space: h1 cols (py,px,c) -> out cols
    # (py,px,qy,qx), taps (ai,aj) on the base grid
    k2 = params["deconv_out"]["kernel"][..., 0]                 # [k,k,C1]
    b2_raw = float(params["deconv_out"]["bias"][0])
    w2s = np.zeros((3, 3, 2, 2, c1, 2, 2, 2, 2), np.float32)
    for qy in range(2):
        for aU in (-1, 0, 1):
            dy = pad - qy + 2 * aU
            if not 0 <= dy < k:
                continue
            for py in range(2):
                py2 = (py + aU) % 2
                ai = (py + aU - py2) // 2
                for qx in range(2):
                    for aV in (-1, 0, 1):
                        dx = pad - qx + 2 * aV
                        if not 0 <= dx < k:
                            continue
                        for px in range(2):
                            px2 = (px + aV) % 2
                            aj = (px + aV - px2) // 2
                            w2s[ai + 1, aj + 1, py2, px2, :,
                                py, px, qy, qx] = k2[dy, dx]
    # [9][ (py2,px2,c)=4C1, (py,px,qy,qx)=16 ] -> [4C1, 9*16], padded to a
    # lane-aligned 128-multiple column count (Mosaic requires 128-aligned
    # minor dims on matmul operands reshaped from 3-D)
    w2_taps = w2s.reshape(9, 4 * c1, 16)
    w2_all = np.concatenate([w2_taps[t0] for t0 in range(9)], axis=1)
    w2_allT = np.concatenate([w2_taps[t0].T for t0 in range(9)], axis=0)
    cols = w2_all.shape[1]                       # 144
    pad_cols = (-cols) % 128
    w2_all = np.pad(w2_all, ((0, 0), (0, pad_cols)))
    w2_allT = np.pad(w2_allT, ((0, pad_cols), (0, 0)))
    b2 = np.full((1, 1, 16), b2_raw, np.float32)

    bf = dtype
    return PallasGenPack(
        fc_w2=jnp.asarray(fc_w2, bf),
        fc_w2T=jnp.asarray(fc_w2.T, bf),
        fc_b=jnp.asarray(fc_b2, jnp.float32),
        w1=jnp.asarray(w1_taps, bf), w1_all=jnp.asarray(w1_all, bf),
        w1_allT=jnp.asarray(w1_allT, bf),
        b1=jnp.asarray(b1, jnp.float32),
        w2_all=jnp.asarray(w2_all, bf), w2_allT=jnp.asarray(w2_allT, bf),
        b2=jnp.asarray(b2, jnp.float32),
        hw=hw, z_dim=z_dim, c0=c0, c1=c1)


def nest_phases(x_tanh: jnp.ndarray, hw: int = 7) -> jnp.ndarray:
    """[N, 4*hw, 4*hw, 1] image -> [N, hw*hw, 16] nested-phase layout.

    Pixel (Y, X) = (4i + 2py + qy, 4j + 2px + qx) -> row (i*hw + j),
    col ((py*2 + px)*4 + qy*2 + qx).
    """
    n = x_tanh.shape[0]
    x = x_tanh.reshape(n, hw, 2, 2, hw, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)  # [n, i, j, py, px, qy, qx]
    return x.reshape(n, hw * hw, 16)


def unnest_phases(x_nested: jnp.ndarray, hw: int = 7) -> jnp.ndarray:
    """Inverse of nest_phases: [N, hw*hw, 16] -> [N, 4hw, 4hw, 1]."""
    n = x_nested.shape[0]
    x = x_nested.reshape(n, hw, hw, 2, 2, 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [n, i, py, qy, j, px, qx]
    return x.reshape(n, 4 * hw, 4 * hw, 1)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _shift_sets(hw: int) -> Tuple[Tuple[int, ...], ...]:
    """(shift, mask-offsets) per tap t = (ay+1)*3 + (ax+1)."""
    out = []
    for ay in (-1, 0, 1):
        for ax in (-1, 0, 1):
            out.append((ay * hw + ax, ay, ax))
    return tuple(out)


def _masks(hw: int, rows: int):
    """Per-tap validity masks [1, hw*hw, 1] as a python list of arrays."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, hw * hw, 1), 1)
    i = p // hw
    j = p % hw
    masks = []
    for _, ay, ax in _shift_sets(hw):
        ok = ((i + ay >= 0) & (i + ay < hw) & (j + ax >= 0) & (j + ax < hw))
        masks.append(ok)
    return masks


def _projection_kernel(z0_ref, x_ref, fcw_ref, fcwt_ref, fcb_ref, w1_ref,
                       w1t_ref, b1_ref, w2_ref, w2t_ref, b2_ref, zout_ref, *,
                       rec_iters: int, rec_lr: float, momentum: float,
                       hw: int, c0: int, c1: int, compute_dtype=jnp.bfloat16,
                       factored_l1: bool = False):
    bf = compute_dtype
    p2 = hw * hw
    taps = _shift_sets(hw)
    masks = _masks(hw, p2)
    x = x_ref[:]                       # [T, 49, 16] f32 (tanh space, nested)
    npix = 16 * p2

    dn_mm = (((2,), (0,)), ((), ()))              # [T,49,A] x [A,B]

    def matmul3(a, b, dn=dn_mm):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    def roll(a, s):
        # jnp.roll(x, 0) lowers to a zero-size slice, which Mosaic rejects
        return a if s == 0 else jnp.roll(a, s, axis=1)

    def step(_, carry):
        z, v = carry
        tsz = z.shape[0]
        # ---- forward -----------------------------------------------------
        h0_pre = jnp.dot(z.astype(bf), fcw_ref[:],
                         preferred_element_type=jnp.float32) + fcb_ref[:]
        # trailing-dim split [T, 49*C0] -> [T, 49, C0] (row-major view)
        h0 = jnp.maximum(h0_pre, 0.0).astype(bf).reshape(tsz, p2, c0)

        g1 = b1_ref[:]                              # [1,1,4C1] broadcasts
        if factored_l1:
            # ONE [T*49, C0] @ [C0, 9*4C1] matmul (w1_ref pre-packed as
            # [C0, 9*4C1] on the host), then 9 roll/mask adds of 4C1-wide
            # slices (fewer, larger MXU ops; more VPU traffic). Valid since
            # roll commutes with the column contraction.
            f1 = matmul3(h0, w1_ref[:])
            for t, (s, _, _) in enumerate(taps):
                blk = jax.lax.slice_in_dim(f1, t * 4 * c1, (t + 1) * 4 * c1,
                                           axis=2)
                shifted = roll(blk, -s)
                g1 = g1 + jnp.where(masks[t], shifted,
                                    jnp.zeros_like(shifted))
        else:
            for t, (s, _, _) in enumerate(taps):
                shifted = roll(h0, -s)
                masked = jnp.where(masks[t], shifted,
                                   jnp.zeros_like(shifted))
                g1 = g1 + matmul3(masked, w1_ref[t])
        h1 = jnp.maximum(g1, 0.0).astype(bf)        # [T,49,4C1]

        f2 = matmul3(h1, w2_ref[:])                 # [T,49,144] f32
        out = b2_ref[:]
        for t, (s, _, _) in enumerate(taps):
            blk = jax.lax.slice_in_dim(f2, t * 16, (t + 1) * 16, axis=2)
            shifted = roll(blk, -s)
            out = out + jnp.where(masks[t], shifted, jnp.zeros_like(shifted))
        g = jnp.tanh(out)                           # [T,49,16] f32

        # ---- backward (w.r.t. z only; frozen weights) --------------------
        d_o = ((2.0 / npix) * (g - x) * (1.0 - g * g)).astype(bf)
        e_blocks = []
        for t, (s, _, _) in enumerate(taps):
            masked = jnp.where(masks[t], d_o, jnp.zeros_like(d_o))
            e_blocks.append(roll(masked, s))
        pad_cols = w2t_ref.shape[0] - 16 * len(taps)
        if pad_cols:
            e_blocks.append(jnp.zeros((tsz, p2, pad_cols), bf))
        e2 = jnp.concatenate(e_blocks, axis=2)      # [T,49,256] (padded)
        dh1 = matmul3(e2, w2t_ref[:])               # [T,49,4C1] f32
        # relu masks compare in f32 (bf16 cmpf unsupported on the VPU)
        dh1 = jnp.where(h1.astype(jnp.float32) > 0, dh1, 0.0).astype(bf)

        d_big = matmul3(dh1, w1t_ref[:])            # [T,49,9*C0] f32
        dh0 = jnp.zeros((z.shape[0], p2, c0), jnp.float32)
        for t, (s, _, _) in enumerate(taps):
            blk = jax.lax.slice_in_dim(d_big, t * c0, (t + 1) * c0, axis=2)
            masked = jnp.where(masks[t], blk, jnp.zeros_like(blk))
            dh0 = dh0 + roll(masked, s)
        dh0 = jnp.where(h0.astype(jnp.float32) > 0, dh0, 0.0).astype(bf)

        dz = jnp.dot(dh0.reshape(tsz, p2 * c0), fcwt_ref[:],
                     preferred_element_type=jnp.float32)
        # ---- momentum update (tf.train.MomentumOptimizer semantics) ------
        v = momentum * v + dz
        z = z - rec_lr * v
        return z, v

    z0 = z0_ref[:]
    z, _ = jax.lax.fori_loop(0, rec_iters, step,
                             (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z


def fused_project_z(pack: PallasGenPack, x_tanh: jnp.ndarray,
                    z0: jnp.ndarray, *, rec_iters: int, rec_lr: float,
                    momentum: float, tile: int = 32,
                    factored_l1: bool = False,
                    vmem_limit_mb: int = 100,
                    interpret: bool = False) -> jnp.ndarray:
    """Run L momentum-SGD steps of min_z ||G(z) - x||^2 fully on-chip.

    x_tanh: [N, 28, 28, 1] in [-1, 1]; z0: [N, z_dim]. Returns z_final.
    N must be a multiple of `tile` (callers pad; reconstructors use
    batch*restarts which are multiples of the tile in practice).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, z_dim = z0.shape
    if n % tile:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    hw, c0, c1 = pack.hw, pack.c0, pack.c1
    p2 = hw * hw
    x_nested = nest_phases(x_tanh, hw)             # [N, 49, 16] f32

    kernel = functools.partial(
        _projection_kernel, rec_iters=rec_iters, rec_lr=rec_lr,
        momentum=momentum, hw=hw, c0=c0, c1=c1,
        compute_dtype=pack.fc_w2.dtype, factored_l1=factored_l1)
    w1_arg = pack.w1_all if factored_l1 else pack.w1

    grid = (n // tile,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, z_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, p2, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(pack.fc_w2.shape),
            full(pack.fc_w2T.shape),
            full(pack.fc_b.shape),
            full(w1_arg.shape),
            full(pack.w1_allT.shape),
            full(pack.b1.shape),
            full(pack.w2_all.shape),
            full(pack.w2_allT.shape),
            full(pack.b2.shape),
        ],
        out_specs=pl.BlockSpec((tile, z_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, z_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(z0.astype(jnp.float32), x_nested, pack.fc_w2, pack.fc_w2T, pack.fc_b,
      w1_arg, pack.w1_allT, pack.b1, pack.w2_all, pack.w2_allT, pack.b2)


# --------------------------------------------------------------------------
# public reconstructor API
# --------------------------------------------------------------------------

def projection_kernel_available(gan=None) -> bool:
    """True when the fused kernel covers the model topology + platform."""
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:
        return False
    if gan is None:
        return True
    g = gan.generator
    return g.base_hw == 7 and len(g.channels) == 2 and g.out_channels == 1


def make_pallas_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                              rec_lr: float, momentum: float,
                              tile: int = 32, factored_l1: bool = False,
                              vmem_limit_mb: int = 100,
                              interpret: bool = False):
    """Jitted f(x, key) -> ReconstructionResult on the fused Pallas loop.

    Best-restart selection + final G(z*) run outside the kernel (1 generator
    pass of the 200 — negligible), using the same packed-weight generator.
    """
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    variables = {"params": gan.state.gen_params,
                 "batch_stats": gan.state.gen_stats}
    pack = pack_for_pallas(gan.generator, variables)

    def gen_apply(z):
        return gan.generator.apply(variables, z, train=False)

    z_dim = gan.cfg.latent_dim

    @jax.jit
    def run(x, key):
        batch = x.shape[0]
        z0 = sample_z0(key, batch, rec_rr, z_dim)
        x_tanh = from_image_space(x)
        x_flat = jnp.broadcast_to(x_tanh[:, None],
                                  (batch, rec_rr) + x_tanh.shape[1:])
        x_flat = x_flat.reshape((batch * rec_rr,) + x_tanh.shape[1:])
        z_final = fused_project_z(pack, x_flat,
                                  z0.reshape(batch * rec_rr, z_dim),
                                  rec_iters=rec_iters, rec_lr=rec_lr,
                                  momentum=momentum, tile=tile,
                                  factored_l1=factored_l1,
                                  vmem_limit_mb=vmem_limit_mb,
                                  interpret=interpret)
        g_final = gen_apply(z_final)
        d = (g_final - x_flat).astype(jnp.float32)
        losses = jnp.mean(jnp.square(d),
                          axis=tuple(range(1, d.ndim))).reshape(batch,
                                                                rec_rr)
        best = jnp.argmin(losses, axis=1)
        z_star = z_final.reshape(batch, rec_rr, z_dim)[
            jnp.arange(batch), best]
        x_hat = to_image_space(gen_apply(z_star))
        return ReconstructionResult(
            x_hat=x_hat, z_star=z_star,
            loss=losses[jnp.arange(batch), best], all_losses=losses)

    return run
