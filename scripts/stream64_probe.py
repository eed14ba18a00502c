#!/usr/bin/env python
"""64x64 streaming-kernel probe (VERDICT round-3 item 6 / TODO #1).

Question to settle WITHOUT building the full kernel: can a fused
HBM-streaming Pallas block beat XLA on the reference-depth 64x64
generator's hot levels by enough to justify a full fused projection
kernel (priced at ~1.5x over deep celeba's 421 recon/s, capped by the
~1.44x FLOP inflation of 9-tap phase packing)?

The probe takes ONE deconv level (deconv + folded-BN + ReLU) and measures
the projection-shaped workload through it — forward PLUS backward-to-
input, the two things the R x L loop runs per level per step — as:

  XLA:    scan of  x <- x - eta * d/dx[ sum(relu(deconv_bn(x)) * cot) ]
          (XLA schedules the deconv pair; the elementwise chain + relu
          mask are its own fusions — this is exactly the trace-measured
          38-45%-of-peak regime, output/traces/p64);
  Pallas: same scan, but the level is ONE kernel: 9 shift-masked matmuls
          (phase-major, a la kernels/fused_projection_v3.py) + bias +
          ReLU + cotangent + relu-mask + 9 transposed matmuls, with the
          intermediate activation NEVER touching HBM. Per iteration the
          kernel streams x in and dx out — the "HBM-streaming fused
          block" of TODO #1, at honest (1.44x-inflated) FLOPs.

Weight packing reuses defense/fastgen.py::phase_decompose (the validated
stride-2-deconv -> 4 stride-1 phase convs rewrite); shifts/masks reuse
the v3 kernel's row conventions (row = pixel*T + t on the base grid).
Numerics: the kernel's dx must match XLA's dx (same folded weights, same
cotangent) — checked before timing.

Levels probed (celeba deep, dim=64 — equal MXU FLOPs each, together
~97% of the generator's conv FLOPs):
  L0: 4x4x512   -> 8x8x256
  L1: 8x8x256   -> 16x16x128
  L2: 16x16x128 -> 32x32x64

Decision rule (written before measuring): if the fused block's per-iter
time is >= ~1.35x faster than XLA's on the heavy levels, the full kernel
plausibly clears 1.5x end-to-end (levels are ~90% of step time in the
trace) -> build it; if it is <~1.15x, TODO #1 closes as measured-not-
worth-it.

Run: python scripts/stream64_probe.py [--levels 0 1 2] [--iters 50]
     (cwd=/root/repo; CPU smoke: --interpret --batch 8 --tile 4 --iters 2)
"""

import argparse
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

from defensegan_tpu.defense.fastgen import phase_decompose  # noqa: E402
from defensegan_tpu.kernels.fused_projection_v3 import (  # noqa: E402
    _tap_masks, _tap_offsets)

# celeba deep (dim=64) heavy levels: (base H, Cin, Cout)
LEVELS = {0: (4, 512, 256), 1: (8, 256, 128), 2: (16, 128, 64)}


def pack_level(w, b, scale, shift):
    """Fold BN into a [5,5,ci,co] deconv kernel and pack it shift-major.

    Returns (wcat [9, ci, 4*co], wcat_t [9, 4*co, ci], bias [4*co]):
    wcat[k][:, blk(p,q)] is the weight tap a base-grid pixel P reads from
    input pixel P + off_k when producing output phase (p, q); taps a phase
    does not use (the 2-tap rows of the 5-tap stride-2 window) stay zero —
    the priced 36/25 = 1.44x FLOP inflation, carried honestly.
    """
    w = np.asarray(w, np.float32) * np.asarray(scale, np.float32)
    b = np.asarray(shift, np.float32) + np.asarray(b, np.float32) * \
        np.asarray(scale, np.float32)
    ci, co = w.shape[2], w.shape[3]
    pc = phase_decompose(w, b)
    wcat = np.zeros((9, ci, 4 * co), np.float32)
    for p in range(2):
        for q in range(2):
            K = np.asarray(pc.kernels[p][q], np.float32)
            (ylo, _), (xlo, _) = pc.pads[p][q]
            for jy in range(K.shape[0]):
                dy = jy - ylo
                for jx in range(K.shape[1]):
                    dx = jx - xlo
                    assert abs(dy) <= 1 and abs(dx) <= 1, (dy, dx)
                    k_idx = (dy + 1) * 3 + (dx + 1)
                    blk = (p * 2 + q) * co
                    wcat[k_idx, :, blk:blk + co] = K[jy, jx]
    wcat_t = np.transpose(wcat, (0, 2, 1)).copy()
    bias = np.tile(np.asarray(pc.bias, np.float32), 4)
    return wcat, wcat_t, bias


def phase_perm(h, co):
    """Row/col mapping: standard out[n, 2y+p, 2x+q, c] as a gather from the
    phase-blocked [n, h, h, 4*co] layout (for the numerics check)."""
    idx = np.zeros((2 * h, 2 * h, co, 3), np.int64)
    for oy in range(2 * h):
        for ox in range(2 * h):
            p, q = oy % 2, ox % 2
            idx[oy, ox, :, 0] = oy // 2
            idx[oy, ox, :, 1] = ox // 2
            idx[oy, ox, :, 2] = (p * 2 + q) * co + np.arange(co)
    return idx


def _probe_kernel(x_ref, cot_ref, w_ref, wt_ref, b_ref, masks_ref, dx_ref,
                  *, tile: int, g: int, ci: int, co4: int):
    """Fused level fwd+bwd for one tile of T images, rows = pixel*T + t."""
    rows = g * g * tile
    offs = [(dy * g + dx) * tile for dy, dx in _tap_offsets(g)]
    w = w_ref[:]                  # [9*ci, co4] bf16 (taps stacked on rows)
    wt = wt_ref[:]                # [9*co4, ci] bf16
    b = b_ref[:]                  # [1, co4] f32
    x = x_ref[:]                  # [rows, ci] bf16
    cot = cot_ref[:]              # [rows, co4] bf16

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
        return out * m[k if sign > 0 else 8 - k]

    # ---- forward: h = relu(sum_k shift(x, k) @ W_k + b)
    h = jnp.zeros((rows, co4), jnp.float32)
    for k in range(9):
        h = h + jnp.dot(shifted(x, k), w[k * ci:(k + 1) * ci, :],
                        preferred_element_type=jnp.float32)
    h = h + b
    # ---- backward to input: dh = relu'(h) * cot; dx = sum_k shift^-1(dh @ W_k^T)
    dh = jnp.where(h > 0.0, cot.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
    dx = jnp.zeros((rows, ci), jnp.float32)
    for k in range(9):
        acc = jnp.dot(dh, wt[k * co4:(k + 1) * co4, :],
                      preferred_element_type=jnp.float32)
        dx = dx + shifted(acc.astype(jnp.bfloat16), k, -1).astype(jnp.float32)
    dx_ref[:] = dx


def make_fused_level(wcat, wcat_t, bias, g, tile, interpret=False):
    """Returns f(x_rows bf16 [N*g*g, ci], cot_rows bf16 [N*g*g, 4co]) -> dx
    rows f32, plus the constants it closes over."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci = wcat.shape[1]
    co4 = wcat.shape[2]
    rows = g * g * tile
    w = jnp.asarray(wcat.reshape(9 * ci, co4), jnp.bfloat16)
    wt = jnp.asarray(wcat_t.reshape(9 * co4, ci), jnp.bfloat16)
    b = jnp.asarray(bias[None, :], jnp.float32)
    masks_r = jnp.asarray(np.repeat(_tap_masks(g), tile, axis=0),
                          jnp.float32)
    kernel = functools.partial(_probe_kernel, tile=tile, g=g, ci=ci,
                               co4=co4)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def run(x_rows, cot_rows):
        n_rows = x_rows.shape[0]
        assert n_rows % rows == 0
        grid = (n_rows // rows,)
        f = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, ci), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, co4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(w), full(wt), full(b), full(masks_r),
            ],
            out_specs=pl.BlockSpec((rows, ci), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, ci), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )
        return f(x_rows, cot_rows, w, wt, b, masks_r)

    return run


def to_rows(x, tile):
    """[N, H, W, C] -> pixel-major rows [N*H*W, C] (row = pixel*T + t
    within each tile of T images)."""
    n, h, w, c = x.shape
    assert n % tile == 0
    return (x.reshape(n // tile, tile, h * w, c)
            .transpose(0, 2, 1, 3).reshape(n * h * w, c))


def from_rows(r, n, h, tile):
    c = r.shape[-1]
    return (r.reshape(n // tile, h * h, tile, c)
            .transpose(0, 2, 1, 3).reshape(n, h, h, c))


def xla_level(w, b, scale, shift):
    """The same folded level as XLA runs it: deconv + bias + relu."""
    wf = jnp.asarray(np.asarray(w, np.float32)
                     * np.asarray(scale, np.float32), jnp.bfloat16)
    bf = jnp.asarray(np.asarray(shift, np.float32)
                     + np.asarray(b, np.float32)
                     * np.asarray(scale, np.float32), jnp.float32)

    def apply(x):
        y = jax.lax.conv_transpose(
            x.astype(jnp.bfloat16), wf, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y.astype(jnp.float32) + bf, 0.0)

    return apply


def run_probe(level, batch, tile, iters, repeats, interpret=False,
              seed=0):
    g, ci, co = LEVELS[level]
    key = jax.random.key(seed)
    kw, kb, kx, kc = jax.random.split(key, 4)
    w = 0.1 * jax.random.normal(kw, (5, 5, ci, co), jnp.float32)
    b = 0.1 * jax.random.normal(kb, (co,), jnp.float32)
    # synthetic BN affine (inference-folded): scale ~ O(1), shift small
    scale = 1.0 + 0.1 * np.asarray(
        jax.random.normal(jax.random.key(seed + 1), (co,)))
    shift = 0.05 * np.asarray(
        jax.random.normal(jax.random.key(seed + 2), (co,)))
    x0 = jax.random.normal(kx, (batch, g, g, ci), jnp.float32)
    cot_std = jax.random.normal(kc, (batch, 2 * g, 2 * g, co),
                                jnp.float32)

    wcat, wcat_t, bias = pack_level(np.asarray(w), np.asarray(b), scale,
                                    shift)
    fused = make_fused_level(wcat, wcat_t, bias, g, tile,
                             interpret=interpret)
    apply_x = xla_level(np.asarray(w), np.asarray(b), scale, shift)

    # phase-blocked cotangent: same values as cot_std, kernel layout
    idx = phase_perm(cot_std.shape[1] // 2, co)
    cot_blk = np.zeros((batch, g, g, 4 * co), np.float32)
    cot_np = np.asarray(cot_std)
    cot_blk[:, idx[..., 0], idx[..., 1], idx[..., 2]] = cot_np
    cot_rows = jnp.asarray(to_rows(jnp.asarray(cot_blk), tile),
                           jnp.bfloat16)

    # ---- numerics: kernel dx vs XLA dx under the SAME folded weights
    def xla_loss(x):
        return jnp.sum(apply_x(x) * cot_std)

    dx_ref = jax.jit(jax.grad(xla_loss))(x0)
    x_rows = jnp.asarray(to_rows(x0, tile), jnp.bfloat16)
    dx_rows = fused(x_rows, cot_rows)
    dx_got = from_rows(np.asarray(dx_rows), batch, g, tile)
    ref = np.asarray(dx_ref)
    denom = np.abs(ref).max() + 1e-30
    rel_err = float(np.abs(dx_got - ref).max() / denom)
    print(f"L{level}: max|dx - dx_xla| / max|dx_xla| = {rel_err:.3e} "
          f"(bf16 matmuls; expect <2e-2)", flush=True)
    ok = rel_err < 2e-2

    # ---- timed A/B: scan of x <- x - eta * dx (projection-shaped stream)
    eta = 1e-3

    @jax.jit
    def xla_scan(x):
        def body(xc, _):
            return xc - eta * jax.grad(xla_loss)(xc), None
        return jax.lax.scan(body, x, None, length=iters)[0]

    @jax.jit
    def pallas_scan(x_rows):
        def body(xr, _):
            dx = fused(xr.astype(jnp.bfloat16), cot_rows)
            return xr - eta * dx, None
        return jax.lax.scan(body, x_rows.astype(jnp.float32), None,
                            length=iters)[0]

    def timeit(fn, arg):
        float(jnp.sum(fn(arg)))  # compile + warm
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(fn(arg)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    t_xla = timeit(xla_scan, x0)
    t_pal = timeit(pallas_scan, to_rows(x0, tile))
    rec = {
        "metric": f"stream64_probe_L{level}", "batch": batch, "tile": tile,
        "iters": iters, "g": g, "ci": ci, "co": co,
        "numerics_ok": ok, "rel_err": rel_err,
        "xla_ms_per_iter": round(t_xla * 1e3, 3),
        "pallas_ms_per_iter": round(t_pal * 1e3, 3),
        "speedup": round(t_xla / t_pal, 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--levels", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tile", type=int, default=None,
                    help="images per kernel tile (default: per-level "
                    "VMEM-sized)")
    ap.add_argument("--iters", type=int, default=50,
                    help="scan length per timed program (keeps the "
                    "device program well under the ~2 min watchdog)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="pallas interpreter (CPU smoke/numerics)")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)

    default_tile = {0: 128, 1: 64, 2: 32}
    rows = []
    for lvl in args.levels:
        tile = args.tile or default_tile[lvl]
        rows.append(run_probe(lvl, args.batch, tile, args.iters,
                              args.repeats, interpret=args.interpret))
    if rows and not args.interpret:
        from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
        ensure_dir(args.results_dir)
        for r in rows:
            append_jsonl(os.path.join(args.results_dir,
                                      "stream64_probe.jsonl"), r)
    geo = float(np.prod([r["speedup"] for r in rows])) ** (1 / len(rows))
    print(f"geomean level speedup: {geo:.3f} (decision rule: >=1.35 build "
          "the full kernel; <=1.15 close TODO #1)", flush=True)


if __name__ == "__main__":
    main()
