"""Packed inference-time generators for the projection hot loop.

The defense (reference: models/gan.py::reconstruct of kabkabm/defensegan)
runs the FROZEN generator R*L times per image. At inference the generator is
a fixed chain `z -> fc -> BN -> relu -> [deconv -> BN -> relu]* -> deconv ->
tanh`, and every BN (running averages) is an affine map that can be folded
into the adjacent weights once, at pack time. This module builds such packed
generators in three TPU-oriented forms:

  variant="conv"   BN-folded weights, deconvs stay `lax.conv_transpose`
                   (baseline; same op graph XLA sees from flax minus the BN).
  variant="phase"  each stride-2 deconv is rewritten as 4 stride-1
                   sub-kernel convolutions + a pixel-shuffle interleave
                   (the standard TPU-friendly decomposition: no input
                   dilation, so XLA tiles plain convs onto the MXU).
  variant="dense"  (wide/MNIST-family arch only) the single deconv is
                   materialized as a dense [F, H*W*C] matrix, so the WHOLE
                   generator is fc -> relu -> matmul -> tanh: the projection
                   step becomes 4 large MXU matmuls with zero convolution
                   machinery. FLOP count rises ~6x over the sparse deconv but
                   every op runs at near-peak MXU throughput and the same
                   structure drops into a VMEM-resident Pallas kernel
                   (kernels/fused_projection_v2.py).
  variant="hybrid" inner deconvs stay convs; only the FINAL deconv (1 or 3
                   output channels — pathological MXU utilization as a conv)
                   is materialized dense. Works for both archs.
  variant="s2d"    (two-deconv deep archs, e.g. MNIST 7->14->28) the WHOLE
                   stack stays on the base grid in space-to-depth form:
                   each stride-2 deconv becomes a plain 3x3 stride-1 conv
                   whose channels carry the sub-pixel phases (128 -> 4*64
                   -> 16*1 for MNIST deep), and the pixel un-shuffle is a
                   single flat permutation applied OUTSIDE the hot loop.
                   MSE is permutation-invariant, so the projection loop can
                   run entirely in s2d space: zero interleaves, zero input
                   dilation, every op an MXU-friendly wide-channel conv.
                   Kernels are built by probing the exact linear map, so
                   equality to flax holds to dtype rounding (incl. the
                   zero-padding boundary behavior).

All variants are numerically equivalent to `generator.apply(train=False)` up
to dtype rounding (exact in float32 — see tests/test_fastgen.py).

Packed applies return FLAT images [N, H*W*C] in tanh space; `reconstruct`
(defense/project.py) is shape-agnostic, so the flat form avoids every
reshape/relayout in the hot loop. Use `unflatten` on the final result only.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.models.generator import Generator

# jax.lax.conv_transpose(SAME) pad derivation, kernel k stride s:
#   pad_lo = k - 1 if s > k - 1 else ceil((k + s - 2) / 2)
# For the k=5, s=2 deconvs used everywhere here: pad_lo = 3.


def _conv_transpose_pad_lo(k: int, s: int) -> int:
    return k - 1 if s > k - 1 else -((k + s - 2) // -2)


class PhaseConv(NamedTuple):
    """One stride-2 deconv as 4 phase convs: out[2t+p, 2u+q] = phase[p][q]."""

    kernels: Tuple[Tuple[jnp.ndarray, ...], ...]   # [p][q] -> [nh, nw, ci, co]
    pads: Tuple[Tuple[tuple, ...], ...]            # [p][q] -> ((ylo,yhi),(xlo,xhi))
    bias: jnp.ndarray                              # [co], post-interleave


def phase_decompose(kernel: np.ndarray, bias: np.ndarray, stride: int = 2,
                    dtype=jnp.float32) -> PhaseConv:
    """Decompose a stride-2 `lax.conv_transpose` kernel into phase convs.

    For output phase p (rows) the contributing kernel taps m satisfy
    (p + m - pad_lo) even, hitting input offset a = (p + m - pad_lo)/2; the
    taps form a contiguous window, i.e. a plain stride-1 convolution.
    """
    k = kernel.shape[0]
    pad_lo = _conv_transpose_pad_lo(k, stride)
    rows, cols = [], []
    for p in range(stride):
        ms = [m for m in range(k) if (p + m - pad_lo) % stride == 0]
        a = [(p + m - pad_lo) // stride for m in ms]
        rows.append((ms, (-min(a), max(a))))
    kernels, pads = [], []
    for p in range(stride):
        ms_y, pad_y = rows[p]
        k_row, p_row = [], []
        for q in range(stride):
            ms_x, pad_x = rows[q]
            sub = kernel[np.ix_(ms_y, ms_x)]
            k_row.append(jnp.asarray(sub, dtype))
            p_row.append((pad_y, pad_x))
        kernels.append(tuple(k_row))
        pads.append(tuple(p_row))
    return PhaseConv(kernels=tuple(kernels), pads=tuple(pads),
                     bias=jnp.asarray(bias, dtype))


def apply_phase_conv(pc: PhaseConv, h: jnp.ndarray) -> jnp.ndarray:
    """h [N, H, W, ci] -> [N, 2H, 2W, co] == conv_transpose(h, K, s=2, SAME)."""
    dn = ("NHWC", "HWIO", "NHWC")
    cols = []
    for p in range(2):
        row = []
        for q in range(2):
            row.append(jax.lax.conv_general_dilated(
                h, pc.kernels[p][q], window_strides=(1, 1),
                padding=pc.pads[p][q], dimension_numbers=dn))
        # stack q at axis 3: [N, H, W, 2, co]
        cols.append(jnp.stack(row, axis=3))
    out = jnp.stack(cols, axis=2)          # [N, H, 2, W, 2, co]
    n, hh, _, ww, _, c = out.shape
    out = out.reshape(n, 2 * hh, 2 * ww, c)
    return out + pc.bias


def _bn_affine(params: dict, stats: dict, eps: float = 1e-5):
    """BatchNorm(running stats) == y = s*h + t per channel."""
    s = np.asarray(params["scale"]) / np.sqrt(np.asarray(stats["var"]) + eps)
    t = np.asarray(params["bias"]) - s * np.asarray(stats["mean"])
    return s, t


class PackedGenerator(NamedTuple):
    """BN-folded generator weights + static topology info.

    apply_flat(z [N,k]) -> tanh images [N, H*W*C] (see make_packed_apply).
    For variant="s2d" the flat output is in space-to-depth pixel order;
    `perm`/`inv_perm` map image-flat -> s2d-flat and back (img[:, perm] is
    the s2d-ordered view; s2d[:, inv_perm] restores image order).
    """

    variant: str
    base_hw: int
    out_hw: int
    out_channels: int
    w_fc: jnp.ndarray                 # [k, base_hw*base_hw*c0], BN folded
    b_fc: jnp.ndarray                 # [base_hw*base_hw*c0]
    convs: Tuple                      # per deconv: PhaseConv | (kernel, bias)
    dense: Tuple                      # ('dense' only) (D [F, HWC], bD [HWC])
    dtype: jnp.dtype
    perm: Tuple = ()                  # ('s2d' only) (perm, inv_perm) int32


def _s2d(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/f, W/f, f*f*C] space-to-depth (phase-major)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f,
                                                 f * f * c)


def _s2d_inv(x: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """Inverse of _s2d: [N, g, g, f*f*C] -> [N, g*f, g*f, C]."""
    n, g, _, _ = x.shape
    x = x.reshape(n, g, g, f, f, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, g * f, g * f, c)


def _s2d_flat_perm(hw: int, f: int, c: int) -> np.ndarray:
    """Gather indices: img_flat[:, perm] == s2d_flat (both row-major)."""
    idx = np.arange(hw * hw * c).reshape(1, hw, hw, c)
    return np.asarray(_s2d(jnp.asarray(idx), f)).reshape(-1)


def _probe_grid_conv(lin_fn, g: int, cin: int, window: int = 3):
    """Extract the [window, window, cin, cout] SAME-conv kernel of a linear,
    translation-equivariant (zero boundary) map on a [*, g, g, cin] grid.

    Probes with center deltas; asserts the response support fits the window
    (a wrong window size fails loudly instead of silently truncating).
    """
    y0 = g // 2
    r = window // 2
    basis = np.zeros((cin, g, g, cin), np.float32)
    basis[np.arange(cin), y0, y0, np.arange(cin)] = 1.0
    out = np.asarray(lin_fn(jnp.asarray(basis)))      # [cin, g, g, cout]
    mask = np.ones((g, g), bool)
    mask[y0 - r:y0 + r + 1, y0 - r:y0 + r + 1] = False
    spill = np.abs(out[:, mask, :]).max() if mask.any() else 0.0
    if spill > 0:
        raise ValueError(f"conv support exceeds window={window} "
                         f"(max spill {spill:.2e}); widen the window")
    kern = np.zeros((window, window, cin, out.shape[-1]), np.float32)
    for dy in range(window):
        for dx in range(window):
            kern[dy, dx] = out[:, y0 + r - dy, y0 + r - dx, :]
    return kern


def pack_generator(generator: Generator, params: dict, batch_stats: dict,
                   variant: str = "phase") -> PackedGenerator:
    """Fold BN into weights; build the requested inference variant.

    Reference parity note: this packs the same frozen graph the reference
    evaluates inside reconstruct() (models/gan.py ~L350-500); folding is
    exact because inference BN is affine.
    """
    if variant not in ("conv", "phase", "dense", "hybrid", "s2d"):
        raise ValueError(f"unknown packed variant {variant!r}")
    dtype = generator.dtype
    c0 = generator.channels[0]
    hw = generator.base_hw

    # ---- fc + bn_in fold (BN is per last-axis channel of [N,hw,hw,c0]) ----
    w = np.asarray(params["fc_in"]["kernel"], np.float32)   # [k, hw*hw*c0]
    b = np.asarray(params["fc_in"]["bias"], np.float32)
    s, t = _bn_affine(params["bn_in"], batch_stats["bn_in"])
    s_full = np.tile(s, hw * hw)        # row-major (y, x, c) flattening
    t_full = np.tile(t, hw * hw)
    w_fc = jnp.asarray(w * s_full[None, :], dtype)
    b_fc = jnp.asarray(b * s_full + t_full, dtype)

    # ---- deconv blocks: fold following BN into kernel/bias ----
    convs = []
    n_blocks = len(generator.channels) - 1
    for i in range(n_blocks):
        kern = np.asarray(params[f"deconv_{i}"]["kernel"], np.float32)
        bias = np.asarray(params[f"deconv_{i}"]["bias"], np.float32)
        s, t = _bn_affine(params[f"bn_{i}"], batch_stats[f"bn_{i}"])
        kern = kern * s[None, None, None, :]
        bias = bias * s + t
        convs.append((kern, bias, True))     # (kernel, bias, relu_after)
    kern = np.asarray(params["deconv_out"]["kernel"], np.float32)
    bias = np.asarray(params["deconv_out"]["bias"], np.float32)
    convs.append((kern, bias, False))

    out_hw = generator.output_hw
    out_c = generator.out_channels
    dense = ()
    perm = ()
    if variant == "s2d":
        if n_blocks > 1:
            raise ValueError(
                "variant='s2d' covers stacks of at most two deconvs (the "
                "s2d kernel density grows 4x per extra level); got "
                f"{n_blocks + 1}")
        s2d_convs = []
        f_in, cin = 1, c0
        for kern_np, bias_np, relu in convs:
            f_out = 2 * f_in
            kern_j = jnp.asarray(kern_np, jnp.float32)

            def lin_fn(x, kern_j=kern_j, f_in=f_in, cin=cin, f_out=f_out):
                h = _s2d_inv(x, f_in, cin) if f_in > 1 else x
                y = jax.lax.conv_transpose(
                    h, kern_j, strides=(2, 2), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return _s2d(y, f_out)

            k_s2d = _probe_grid_conv(lin_fn, hw, f_in * f_in * cin)
            b_s2d = np.tile(np.asarray(bias_np, np.float32), f_out * f_out)
            s2d_convs.append((jnp.asarray(k_s2d, dtype),
                              jnp.asarray(b_s2d, dtype), relu))
            f_in, cin = f_out, kern_np.shape[3]
        packed_convs: Tuple = tuple(s2d_convs)
        perm_np = _s2d_flat_perm(out_hw, f_in, out_c)
        perm = (jnp.asarray(perm_np, jnp.int32),
                jnp.asarray(np.argsort(perm_np), jnp.int32))
        return PackedGenerator(variant=variant, base_hw=hw, out_hw=out_hw,
                               out_channels=out_c, w_fc=w_fc, b_fc=b_fc,
                               convs=packed_convs, dense=dense, dtype=dtype,
                               perm=perm)
    if variant in ("dense", "hybrid"):
        if variant == "dense" and n_blocks != 0:
            raise ValueError("variant='dense' covers the single-deconv wide "
                             "arch only (len(channels) must be 1); use "
                             "'hybrid' for deep archs")
        # Materialize the FINAL (linear) deconv as a dense matrix by probing
        # with the identity basis: exact, convention-free.
        kern, bias, _ = convs[-1]
        in_hw = out_hw // 2
        in_c = kern.shape[2]
        feat = in_hw * in_hw * in_c
        if feat > 16384:
            # the identity probe is O(feat^2) memory — 64x64 archs would
            # allocate an ~feat x 4*feat f32 matrix (tens of GB)
            raise ValueError(
                f"variant={variant!r} materializes the final deconv as a "
                f"dense [{feat}, {4 * feat}] matrix — too large for this "
                f"topology (final-deconv input {in_hw}x{in_hw}x{in_c}); "
                "use variant='conv' (or 's2d'/'phase') instead")
        eye = np.eye(feat, dtype=np.float32).reshape(feat, in_hw, in_hw, in_c)
        cols = jax.lax.conv_transpose(
            jnp.asarray(eye), jnp.asarray(kern), strides=(2, 2),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        d_mat = jnp.asarray(cols.reshape(feat, out_hw * out_hw * out_c), dtype)
        b_d = jnp.asarray(np.broadcast_to(
            bias, (out_hw, out_hw, out_c)).reshape(-1).copy(), dtype)
        dense = (d_mat, b_d)
        # inner deconvs (hybrid deep path) stay folded convs
        packed_convs: Tuple = tuple(
            (jnp.asarray(k, dtype), jnp.asarray(bb, dtype), relu)
            for k, bb, relu in convs[:-1])
    elif variant == "phase":
        packed_convs = tuple(
            (phase_decompose(k, bb, dtype=dtype), relu)
            for k, bb, relu in convs)
    else:  # conv
        packed_convs = tuple(
            (jnp.asarray(k, dtype), jnp.asarray(bb, dtype), relu)
            for k, bb, relu in convs)

    return PackedGenerator(variant=variant, base_hw=hw, out_hw=out_hw,
                           out_channels=out_c, w_fc=w_fc, b_fc=b_fc,
                           convs=packed_convs, dense=dense, dtype=dtype)


def make_packed_apply(packed: PackedGenerator) -> Callable:
    """Return gen_apply_flat: z [N, k] -> tanh images [N, H*W*C] (f32)."""
    hw = packed.base_hw

    if packed.variant == "dense":
        # wide arch: no inner convs — pure matmul chain
        d_mat, b_d = packed.dense

        def apply_flat(z):
            h = jnp.maximum(
                z.astype(packed.dtype) @ packed.w_fc + packed.b_fc, 0)
            o = h @ d_mat + b_d
            return jnp.tanh(o).astype(jnp.float32)

        return apply_flat

    if packed.variant == "s2d":
        # whole stack on the base grid: stride-1 SAME convs over s2d
        # channels; output stays in s2d pixel order (packed.perm maps it)
        def apply_flat(z):
            h = z.astype(packed.dtype) @ packed.w_fc + packed.b_fc
            h = jnp.maximum(h, 0)
            c0_ = packed.w_fc.shape[1] // (hw * hw)
            h = h.reshape(h.shape[0], hw, hw, c0_)
            for kern, bias, relu in packed.convs:
                h = jax.lax.conv_general_dilated(
                    h, kern, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
                if relu:
                    h = jnp.maximum(h, 0)
            out = jnp.tanh(h).astype(jnp.float32)
            return out.reshape(out.shape[0], -1)

        return apply_flat

    def apply_flat(z):
        h = z.astype(packed.dtype) @ packed.w_fc + packed.b_fc
        h = jnp.maximum(h, 0)
        c0_ = packed.w_fc.shape[1] // (hw * hw)
        h = h.reshape(h.shape[0], hw, hw, c0_)
        for entry in packed.convs:
            if packed.variant == "phase":
                pc, relu = entry
                h = apply_phase_conv(pc, h)
            else:
                kern, bias, relu = entry
                h = jax.lax.conv_transpose(
                    h, kern, strides=(2, 2), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            if relu:
                h = jnp.maximum(h, 0)
        if packed.variant == "hybrid":
            d_mat, b_d = packed.dense
            o = h.reshape(h.shape[0], -1) @ d_mat + b_d
            return jnp.tanh(o).astype(jnp.float32)
        out = jnp.tanh(h).astype(jnp.float32)
        return out.reshape(out.shape[0], -1)

    return apply_flat


def packed_apply_for(gan, variant: str = "phase") -> Callable:
    """Pack the gan's current frozen generator; returns gen_apply_flat."""
    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant=variant)
    return make_packed_apply(packed)


def unflatten(flat: jnp.ndarray, image_shape: Sequence[int]) -> jnp.ndarray:
    return flat.reshape((flat.shape[0],) + tuple(image_shape))
