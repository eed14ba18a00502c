"""Pallas TPU fused projection v4: multi-deconv 64x64 generators.

Covers the 64x64 stacks (celeba/imagenet64, deep AND wide — reference:
models/gan.py::generator_fn of kabkabm/defensegan at the CelebA topology,
z -> fc -> 4x4x512 -> four 5x5/2 deconv+BN+ReLU blocks -> 64x64x3 tanh)
plus the two-deconv MNIST deep topology as an edge case (the v3 kernel's
domain). The whole R x L momentum-GD projection loop runs VMEM-resident
per tile of T latents, like v2/v3 (fused_projection_v2.py / _v3.py).

Why a third kernel family: XLA sits at 38-45% of MXU peak on the 64x64
stacks (round-3 trace analysis, output/traces/p64) — convs run ~90% of
peak while executing, but ~40% of step time is f32 elementwise/convert
fusions between them, and every inter-conv activation round-trips HBM at
f32. v4 fuses the full fwd+bwd chain so intermediate activations never
leave VMEM, at the priced 36/25 = 1.44x FLOP inflation of 9-tap phase
packing (TODO #1 arithmetic; the stream64 probe measures the per-level
win on hardware before this kernel is trusted).

Design (every piece reuses validated machinery):
  - every deconv level, INCLUDING the final one, is a 3x3 SAME grid-conv
    in space-to-depth form, extracted numerically by
    defense/fastgen.py::_probe_grid_conv (v3's packing path):
      mid level:  [g, g, C_in]      -> blocked [g, g, 4*C_out] (+b, relu)
      out level:  [g_f, g_f, 4*C_M] -> double-blocked [g_f, g_f, 16*out_c]
    The out-level fold composes the LAST interleave + 5x5/2 deconv into
    one grid-conv on the last mid grid, so the deepest (4*g_f^2-slice)
    interleave never exists. MSE is permutation-invariant, so the loop
    never leaves blocked space; targets are pre-permuted once outside.
  - a grid-conv is 9 shift-masked matmuls on pixel-major rows
    (row = pixel*T + t), v3's exact conventions: static slice+concat
    shifts (pltpu.roll crashes this Mosaic toolchain), per-grid boundary
    masks, backward = transposed taps with mask index 8-k;
  - between mid levels the blocked output interleaves to its fine grid
    via 4*g^2 static [T, C] slice copies — per-level weights stay small
    (full-stack s2d would compound to ~150 MB at 64x64; TODO #1 notes);
  - backward reuses stashed activations for relu masks; fc fwd/bwd is
    v3's per-pixel-block matmul pattern.

Dispatch: OPT-IN as PROJECTION_KERNEL=pallas_v4 until its on-chip quality
gate + A/B pass (scripts/fused_projection_v4_exp.py; decision recorded in
RESULTS.md). auto never resolves here yet.

Numerics (tests/test_fused_v4.py, interpret mode): one-step kernel delta
matches the f32 packed-apply gradient to ~1e-2 (bf16); 5-step losses
match the XLA projection to ~3e-6 with exact argmin agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.defense.fastgen import (_probe_grid_conv, _s2d,
                                            _s2d_inv, pack_generator)
from defensegan_tpu.kernels.fused_projection_v3 import (_tap_masks,
                                                        _tap_offsets)


def v4_kernel_available(gan) -> bool:
    """v4 covers multi-deconv stacks (len(channels) >= 2) up to the
    imagenet64-deep width (channels[0] <= 768: weights + per-tile
    activations must stay VMEM-resident; v4_tile_for halves the tile
    above the celeba-deep width to keep the live set in budget)."""
    gen = gan.generator
    return len(gen.channels) >= 2 and gen.channels[0] <= 768


def v4_tile_for(gan) -> int:
    """Per-arch kernel tile: 32 latents fits celeba-deep-and-below
    (~50 MB live at dim 64); the imagenet64 widths (channels[0] > 512,
    ~70 MB of weights alone) drop to 16."""
    return 16 if gan.generator.channels[0] > 512 else 32


class V4Pack:
    """Per-level grid-conv weights + topology for the v4 kernel.

    levels: list of dicts, one per GRID-conv in execution order:
      {"g": grid hw, "ci": in lanes, "co": out lanes,
       "w": [9*ci, co] bf16, "wt": [9*co, ci] bf16, "b": [1, co] f32,
       "relu": bool, "interleave_after": C (fine-lane count) or None}
    The LAST level is the folded out-deconv (co = 16*out_c, no relu —
    tanh + loss happen in the kernel after it).
    """

    def __init__(self, gan):
        gen = gan.generator
        packed = pack_generator(gen, gan.state.gen_params,
                                gan.state.gen_stats, variant="conv")
        self.base_hw = g = gen.base_hw
        self.out_hw = gen.output_hw
        self.out_c = gen.out_channels
        self.z_dim = int(np.asarray(packed.w_fc).shape[0])
        self.c0 = gen.channels[0]
        # fc (+bn_in fold): regroup the row-major (y, x, c) flat output
        # into per-pixel blocks (v3 layout)
        w_fc = np.asarray(packed.w_fc, np.float32)      # [k, g*g*c0]
        b_fc = np.asarray(packed.b_fc, np.float32)
        self.w1 = jnp.asarray(w_fc, jnp.bfloat16)
        self.w1t = jnp.asarray(w_fc.T.copy(), jnp.bfloat16)
        self.b1 = jnp.asarray(b_fc.reshape(g * g, self.c0), jnp.float32)

        convs = list(packed.convs)                       # (kern, bias, relu)
        if len(convs) < 2:
            raise ValueError("v4 covers multi-deconv stacks; the single-"
                             "deconv wide MNIST arch has the dense v2 "
                             "kernel")
        self.levels = []
        grid = g
        for i, (kern, bias, relu) in enumerate(convs):
            kern = np.asarray(kern, np.float32)
            bias = np.asarray(bias, np.float32)
            ci_im, co_im = kern.shape[2], kern.shape[3]
            last = i == len(convs) - 1
            # the LAST mid level does not interleave: the folded out level
            # reads its blocked output on the same grid (that fold is what
            # removes the deepest 4*g_f^2-slice interleave)
            second_last = i == len(convs) - 2
            kj = jnp.asarray(kern)
            if not last:
                # mid level: [grid, grid, ci] -> blocked [grid, grid, 4*co]
                # (input is plain lanes: every mid level's input was
                # interleaved to its fine grid by the previous level)
                def lin(x, kj=kj):
                    y = jax.lax.conv_transpose(
                        x, kj, strides=(2, 2), padding="SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return _s2d(y, 2)

                kgrid = _probe_grid_conv(lin, grid, ci_im)
                b_l = np.tile(bias, 4)
                co = 4 * co_im
                inter = None if second_last else co_im
            else:
                # folded out level: blocked [grid, grid, 4*ci] -> double-
                # blocked [grid, grid, 16*out_c] (composes the last
                # interleave + final deconv; support asserted 3x3)
                def lin(xb, kj=kj, ci_im=ci_im):
                    h = _s2d_inv(xb, 2, ci_im)
                    y = jax.lax.conv_transpose(
                        h, kj, strides=(2, 2), padding="SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return _s2d(_s2d(y, 2), 2)

                kgrid = _probe_grid_conv(lin, grid, 4 * ci_im)
                b_l = np.tile(bias, 16)
                co = 16 * co_im
                inter = None
            ci = kgrid.shape[2]
            w = np.concatenate([kgrid[dy + 1, dx + 1]
                                for dy, dx in _tap_offsets(grid)], axis=0)
            wt = np.concatenate([kgrid[dy + 1, dx + 1].T
                                 for dy, dx in _tap_offsets(grid)], axis=0)
            self.levels.append({
                "g": grid, "ci": ci, "co": co, "relu": relu,
                "w": jnp.asarray(w, jnp.bfloat16),
                "wt": jnp.asarray(wt, jnp.bfloat16),
                "b": jnp.asarray(b_l[None, :], jnp.float32),
                "interleave_after": inter,
            })
            if inter is not None:
                grid *= 2
        self.final_g = self.levels[-1]["g"]
        self.out_lanes = self.levels[-1]["co"]

    def x_rows(self, x_tanh, tile):
        """[N, H, H, out_c] tanh-space images -> kernel target rows
        [final_g^2 * N, out_lanes] (double-s2d, pixel-major per tile)."""
        n = x_tanh.shape[0]
        xb = x_tanh
        while xb.shape[1] > self.final_g:
            xb = _s2d(xb, 2)
        p2 = self.final_g * self.final_g
        xb = xb.reshape(n, p2, self.out_lanes)
        xb = xb.reshape(n // tile, tile, p2, self.out_lanes)
        return xb.transpose(0, 2, 1, 3).reshape(n * p2, self.out_lanes)


# ---------------------------------------------------------------- kernel
def _shift(v, s):
    if s == 0:
        return v
    z = jnp.zeros((abs(s), v.shape[1]), v.dtype)
    if s > 0:
        return jnp.concatenate([v[s:, :], z], axis=0)
    return jnp.concatenate([z, v[:s, :]], axis=0)


def _grid_conv(x_b16, w, masks, g, tile, ci, co, transpose=False, wt=None):
    """3x3 SAME grid-conv on pixel-major rows: 9 shift-masked matmuls.

    forward:  out[p] += x[p + off_k] @ W_k
    transpose: out[p] += (x @ W_k^T)[p - off_k]  (mask index 8-k)
    masks: list of 9 [rows, 1] f32/bf16 column pairs (f32m, b16m).
    """
    rows = g * g * tile
    offs = [(dy * g + dx) * tile for dy, dx in _tap_offsets(g)]
    no_mask = {k for k, (dy, dx) in enumerate(_tap_offsets(g)) if dx == 0}
    m_b16 = masks
    acc = jnp.zeros((rows, co if not transpose else ci), jnp.float32)
    for k in range(9):
        if not transpose:
            v = _shift(x_b16, offs[k])
            if k not in no_mask:
                v = v * m_b16[k]
            acc = acc + jnp.dot(v, w[k * ci:(k + 1) * ci, :],
                                preferred_element_type=jnp.float32)
        else:
            t = jnp.dot(x_b16, wt[k * co:(k + 1) * co, :],
                        preferred_element_type=jnp.float32)
            v = _shift(t.astype(jnp.bfloat16), -offs[k])
            if k not in no_mask:
                v = v * m_b16[8 - k]
            acc = acc + v.astype(jnp.float32)
    return acc


def _interleave(h_b16, g, tile, c_fine):
    """Blocked [g^2*T rows, 4*c] -> fine [(2g)^2*T rows, c]: 4g^2 static
    [T, c] slice copies (row order = fine-grid standard pixel-major)."""
    g2 = 2 * g
    pieces = []
    for fy in range(g2):
        y, py = fy // 2, fy % 2
        for fx in range(g2):
            x, px = fx // 2, fx % 2
            src = (y * g + x) * tile
            lb = (py * 2 + px) * c_fine
            pieces.append(h_b16[src:src + tile, lb:lb + c_fine])
    return jnp.concatenate(pieces, axis=0)


def _interleave_inv(d_b16, g, tile, c_fine):
    """Inverse of _interleave: fine [(2g)^2*T, c] -> blocked [g^2*T, 4c]."""
    g2 = 2 * g
    rows_out = []
    for y in range(g):
        for x in range(g):
            lanes = []
            for py in range(2):
                for px in range(2):
                    fp = (2 * y + py) * g2 + (2 * x + px)
                    lanes.append(d_b16[fp * tile:(fp + 1) * tile, :])
            rows_out.append(jnp.concatenate(lanes, axis=1))
    return jnp.concatenate(rows_out, axis=0)


def _v4_kernel(z_ref, x_ref, w1_ref, w1t_ref, b1r_ref, *rest,
               level_meta, rec_iters, rec_lr, momentum, tile, c0, g0,
               out_dim):
    """Full R x L projection loop, all levels VMEM-resident.

    rest = per level (w, wt, b) refs, then per distinct grid a masks ref
    [g^2*T rows, 9], then the zout ref (supplied by pallas as the output).
    level_meta: tuple of (g, ci, co, relu, inter_c, mask_slot) per level.
    """
    n_lv = len(level_meta)
    w_refs = rest[:3 * n_lv]
    grids = sorted({m[0] for m in level_meta})
    mask_refs = rest[3 * n_lv:3 * n_lv + len(grids)]
    zout_ref = rest[-1]
    p2 = g0 * g0
    kdim = z_ref.shape[1]

    w1 = w1_ref[:]
    w1t = w1t_ref[:]
    b1r = b1r_ref[:]
    x = x_ref[:].astype(jnp.float32)

    masks_by_grid = {}
    for gi, mr in zip(grids, mask_refs):
        cols = [mr[:, k:k + 1].astype(jnp.bfloat16) for k in range(9)]
        masks_by_grid[gi] = cols

    lv_w = []
    for i in range(n_lv):
        lv_w.append((w_refs[3 * i][:], w_refs[3 * i + 1][:],
                     w_refs[3 * i + 2][:]))

    scale = 2.0 / out_dim

    def step(_, carry):
        z, v = carry
        zb = z.astype(jnp.bfloat16)

        # ---- fc fwd (per-pixel blocks)
        h0 = jnp.concatenate(
            [jnp.dot(zb, w1[:, p * c0:(p + 1) * c0],
                     preferred_element_type=jnp.float32)
             for p in range(p2)], axis=0)
        h0 = jnp.maximum(h0 + b1r, 0.0)
        acts = [h0]                      # post-relu/post-interleave, f32
        h = h0.astype(jnp.bfloat16)

        # ---- level chain fwd
        for i, (g, ci, co, relu, inter_c, _) in enumerate(level_meta):
            w, wt, b = lv_w[i]
            a = _grid_conv(h, w, masks_by_grid[g], g, tile, ci, co)
            a = a + b
            if relu:
                a = jnp.maximum(a, 0.0)
            if inter_c is not None:
                hb = _interleave(a.astype(jnp.bfloat16), g, tile, inter_c)
                acts.append(a)           # blocked pre-interleave (mask src)
                h = hb
            else:
                acts.append(a)
                h = a.astype(jnp.bfloat16)

        # ---- loss grad at the (double-blocked) output
        o = acts[-1]
        t = jnp.tanh(o)
        d = ((t - x) * (1.0 - t * t) * scale).astype(jnp.bfloat16)

        # ---- level chain bwd
        for i in range(n_lv - 1, -1, -1):
            g, ci, co, relu, inter_c, _ = level_meta[i]
            w, wt, b = lv_w[i]
            if inter_c is not None:
                d = _interleave_inv(d, g, tile, inter_c)
            if relu:
                d = jnp.where(acts[i + 1] > 0.0, d.astype(jnp.float32),
                              0.0).astype(jnp.bfloat16)
            dacc = _grid_conv(d, w, masks_by_grid[g], g, tile, ci, co,
                              transpose=True, wt=wt)
            d = dacc.astype(jnp.bfloat16)

        # ---- fc bwd
        dh0 = jnp.where(acts[0] > 0.0, d.astype(jnp.float32), 0.0)
        dh0 = dh0.astype(jnp.bfloat16)
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


def fused_projection_v4(pack: V4Pack, x_rows: jnp.ndarray,
                        z0_flat: jnp.ndarray, *, rec_iters: int,
                        rec_lr: float, momentum: float, tile: int = 32,
                        interpret: bool = False,
                        vmem_limit_mb: int = 115) -> jnp.ndarray:
    """All-L-steps projection for N latents; returns z_final [N, k]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = z0_flat.shape
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    g0 = pack.base_hw
    p2 = g0 * g0
    fin_rows = pack.final_g * pack.final_g * tile

    level_meta = tuple(
        (lv["g"], lv["ci"], lv["co"], lv["relu"], lv["interleave_after"], 0)
        for lv in pack.levels)
    grids = sorted({m[0] for m in level_meta})

    kernel = functools.partial(
        _v4_kernel, level_meta=level_meta, rec_iters=rec_iters,
        rec_lr=rec_lr, momentum=momentum, tile=tile, c0=pack.c0, g0=g0,
        out_dim=pack.out_hw * pack.out_hw * pack.out_c)

    b1r = jnp.repeat(pack.b1, tile, axis=0)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, k), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                     # z0
        pl.BlockSpec((fin_rows, pack.out_lanes), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                     # x rows
        full(pack.w1), full(pack.w1t), full(b1r),
    ]
    operands = [pack.w1, pack.w1t, b1r]
    for lv in pack.levels:
        for a in (lv["w"], lv["wt"], lv["b"]):
            in_specs.append(full(a))
            operands.append(a)
    for gi in grids:
        m = jnp.asarray(np.repeat(_tap_masks(gi), tile, axis=0),
                        jnp.float32)
        in_specs.append(full(m))
        operands.append(m)

    f = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )
    return f(z0_flat, x_rows.astype(jnp.bfloat16), *operands)


def make_v4_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                          rec_lr: float, momentum: float, tile: int = 32,
                          interpret: bool = False):
    """Jitted f(x, key, z0=None) -> ReconstructionResult on the v4 fused
    kernel.

    Selection epilogue (final losses, per-image argmin, G(z*)) runs in
    XLA through the BN-folded packed apply — same semantics as
    defense/project.py. z0 ([B, R, k]) overrides the internal N(0, I)
    sampling (see fused_projection_v2.py)."""
    from defensegan_tpu.defense.fastgen import make_packed_apply
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    pack = V4Pack(gan)
    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant="conv")
    apply_flat = make_packed_apply(packed)
    z_dim = pack.z_dim
    image_shape = gan.cfg.image_shape

    @jax.jit
    def run(x: jnp.ndarray, key: jax.Array,
            z0: jnp.ndarray = None) -> ReconstructionResult:
        batch = x.shape[0]
        n = batch * rec_rr
        x_tanh = from_image_space(x)
        x_rep = jnp.broadcast_to(x_tanh[:, None], (batch, rec_rr)
                                 + x_tanh.shape[1:]).reshape(
                                     (n,) + x_tanh.shape[1:])
        x_rows = pack.x_rows(x_rep, tile)
        if z0 is None:
            z0 = sample_z0(key, batch, rec_rr, z_dim)
        z0 = z0.reshape(n, z_dim)
        z_fin = fused_projection_v4(
            pack, x_rows, z0, rec_iters=rec_iters, rec_lr=rec_lr,
            momentum=momentum, tile=tile, interpret=interpret)
        g = apply_flat(z_fin)
        d = (g - x_rep.reshape(n, -1)).astype(jnp.float32)
        losses = jnp.mean(jnp.square(d), axis=1).reshape(batch, rec_rr)
        best = jnp.argmin(losses, axis=1)
        z_star = z_fin.reshape(batch, rec_rr, z_dim)[
            jnp.arange(batch), best]
        x_hat = to_image_space(apply_flat(z_star)).reshape(
            (batch,) + tuple(image_shape))
        loss = losses[jnp.arange(batch), best]
        res = ReconstructionResult(x_hat=x_hat, z_star=z_star, loss=loss,
                                   all_losses=losses)
        return jax.tree.map(jax.lax.stop_gradient, res)

    return run



