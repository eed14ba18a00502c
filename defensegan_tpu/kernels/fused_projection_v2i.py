"""Pallas TPU fused projection v2i: int8-MXU variant of the v2 dense loop.

The bf16 v2 kernel (fused_projection_v2.py) measures ~98% of the v5e's
bf16 MXU peak — compute-bound, so the only remaining speed-of-light lever
is the int8 MXU (2x the bf16 rate on v5e). The two D-matmuls (h @ D and
do @ D^T, F=6272 x P=896) are ~87% of the step FLOPs; this kernel runs
them on the int8 MXU:

  - D / D^T are quantized per-COLUMN to int8 once at pack time (static
    weights; symmetric, scale = colmax|.|/127, zero-padded columns get a
    guarded scale);
  - activations (h >= 0) and the tanh-gradient signal (do) are quantized
    per-ROW each step (dynamic symmetric scales from a row-max reduction —
    VPU work of the same order as the existing elementwise chain);
  - accumulation int8 x int8 -> int32, dequantized by the rank-1 outer
    product of row and column scales.

Numerical contract: per-row int8 symmetric quantization carries ~7 bits of
relative precision — the same order as bf16's 8-bit mantissa — so the
momentum-GD trajectory stays in the same basin; restart selection and
G(z*) run in f32/bf16 XLA OUTSIDE the kernel exactly like v2, and argmin
agreement vs the XLA path is validated on-chip before this kernel is
trusted (scripts/int8_validate.py).

The z-side matmuls (z @ W1, dh @ W1^T — k=128, ~13% of FLOPs) stay bf16:
their int8 win is bounded and z precision feeds the GD update directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.kernels.fused_projection_v2 import (DensePack, _round_up,
                                                        pack_dense)

LANE = 128


class DensePackInt8(NamedTuple):
    base: DensePack
    dq: jnp.ndarray     # [F, P] int8, D quantized per column
    sd: jnp.ndarray     # [1, P] f32 column scales of D
    dtq: jnp.ndarray    # [P, F] int8, D^T quantized per column
    sdt: jnp.ndarray    # [1, F] f32 column scales of D^T


def _quant_cols(w: np.ndarray):
    """Symmetric per-column int8: returns (q [.,C] int8, s [1,C] f32)."""
    amax = np.abs(w).max(axis=0)
    s = np.where(amax > 0, amax / 127.0, 1.0)  # zero cols: q=0, scale=1
    q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def pack_dense_int8(gan) -> DensePackInt8:
    base = pack_dense(gan)
    d = np.asarray(base.d, np.float32)
    dt = np.asarray(base.dt, np.float32)
    dq, sd = _quant_cols(d)
    dtq, sdt = _quant_cols(dt)
    return DensePackInt8(
        base=base,
        dq=jnp.asarray(dq), sd=jnp.asarray(sd[None, :]),
        dtq=jnp.asarray(dtq), sdt=jnp.asarray(sdt[None, :]),
    )


def _quant_rows(a, amax_guard=1e-30):
    """Symmetric per-row int8 of a f32 array: (q int8, s [T,1] f32)."""
    amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    s = jnp.maximum(amax, amax_guard) / 127.0
    q = jnp.clip(jnp.rint(a / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _loop_kernel_int8(z_ref, x_ref, w1_ref, w1t_ref, b1_ref, dq_ref, sd_ref,
                      dtq_ref, sdt_ref, bd_ref, zout_ref, *, rec_iters: int,
                      rec_lr: float, momentum: float, out_dim: int):
    w1 = w1_ref[:]
    w1t = w1t_ref[:]
    b1 = b1_ref[:]
    dq = dq_ref[:]
    sd = sd_ref[:]
    dtq = dtq_ref[:]
    sdt = sdt_ref[:]
    bd = bd_ref[:]
    x = x_ref[:]
    scale = 2.0 / out_dim

    def step(_, carry):
        z, v = carry
        zb = z.astype(jnp.bfloat16)
        h = jnp.maximum(
            jnp.dot(zb, w1, preferred_element_type=jnp.float32) + b1, 0.0)
        hq, sh = _quant_rows(h)
        acc = jnp.dot(hq, dq, preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (sh * sd) + bd
        t = jnp.tanh(o)
        r = t - x.astype(jnp.float32)
        do = r * (1.0 - t * t) * scale
        gq, sg = _quant_rows(do)
        acc2 = jnp.dot(gq, dtq, preferred_element_type=jnp.int32)
        dh = acc2.astype(jnp.float32) * (sg * sdt)
        dh = jnp.where(h > 0.0, dh, 0.0).astype(jnp.bfloat16)
        dz = jnp.dot(dh, w1t, preferred_element_type=jnp.float32)
        v = momentum * v + dz
        z = z - rec_lr * v
        return (z, v)

    z0 = z_ref[:]
    z_fin, _ = jax.lax.fori_loop(0, rec_iters, step,
                                 (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z_fin


def fused_projection_dense_int8(pack: DensePackInt8,
                                x_flat_tanh: jnp.ndarray,
                                z0_flat: jnp.ndarray, *, rec_iters: int,
                                rec_lr: float, momentum: float,
                                tile: int = 256,
                                interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    base = pack.base
    n, k = z0_flat.shape
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    p = base.d.shape[1]
    pad = p - x_flat_tanh.shape[1]
    x16 = jnp.pad(x_flat_tanh.astype(jnp.bfloat16), ((0, 0), (0, pad)))

    kernel = functools.partial(
        _loop_kernel_int8, rec_iters=rec_iters, rec_lr=rec_lr,
        momentum=momentum, out_dim=base.out_dim)

    grid = (n // tile,)

    def blocked(r):
        return pl.BlockSpec((tile, r), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            blocked(k),            # z0
            blocked(p),            # x
            full(base.w1), full(base.w1t), full(base.b1),
            full(pack.dq), full(pack.sd),
            full(pack.dtq), full(pack.sdt),
            full(base.bd),
        ],
        out_specs=blocked(k),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return f(z0_flat, x16, base.w1, base.w1t, base.b1, pack.dq, pack.sd,
             pack.dtq, pack.sdt, base.bd)


def make_pallas_dense_int8_reconstructor(gan, *, rec_rr: int,
                                         rec_iters: int, rec_lr: float,
                                         momentum: float, tile: int = 256,
                                         interpret: bool = False):
    """Jitted f(x, key, z0=None) -> ReconstructionResult on the int8 fused
    kernel.

    Same f32/bf16 XLA epilogue (final losses, argmin restart, G(z*)) as v2,
    so selection semantics are unchanged; only the in-loop D matmuls are
    int8. z0 ([B, R, k]) overrides the internal N(0, I) sampling (see
    fused_projection_v2.py::make_pallas_dense_reconstructor).
    """
    from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                pack_generator)
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    pack = pack_dense_int8(gan)
    apply_flat = make_packed_apply(pack_generator(
        gan.generator, gan.state.gen_params, gan.state.gen_stats,
        variant="dense"))
    z_dim = pack.base.z_dim
    image_shape = gan.cfg.image_shape

    @jax.jit
    def run(x: jnp.ndarray, key: jax.Array,
            z0: jnp.ndarray = None) -> ReconstructionResult:
        batch = x.shape[0]
        x_tanh = from_image_space(x).reshape(batch, -1)
        x_rep = jnp.broadcast_to(x_tanh[:, None],
                                 (batch, rec_rr) + x_tanh.shape[1:])
        x_rep = x_rep.reshape(batch * rec_rr, -1)
        if z0 is None:
            z0 = sample_z0(key, batch, rec_rr, z_dim)
        z0 = z0.reshape(batch * rec_rr, z_dim)
        z_fin = fused_projection_dense_int8(
            pack, x_rep, z0, rec_iters=rec_iters, rec_lr=rec_lr,
            momentum=momentum, tile=tile, interpret=interpret)
        g = apply_flat(z_fin)
        d = (g - x_rep).astype(jnp.float32)
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
