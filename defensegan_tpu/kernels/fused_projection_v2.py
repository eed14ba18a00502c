"""Pallas TPU fused projection v2: the all-matmul wide-generator loop.

Covers the flagship wide arch (fc -> relu -> one stride-2 deconv -> tanh;
configs/gans/mnist_fast.yml). The deconv is LINEAR, so it is materialized
once as a dense matrix D [F, 896] (fastgen dense packing, output padded
784 -> 896 = 7*128 lanes with zero columns); the whole projection step
(reference semantics: models/gan.py::reconstruct of kabkabm/defensegan —
fwd, d||G(z)-x||^2/dz, tf-Momentum update) is then FOUR MXU matmuls plus
VPU elementwise:

    h  = relu(z @ W1 + b1)            [T, F]    bf16, f32 accum
    o  = h @ D + bD                   [T, 896]  f32
    t  = tanh(o);  r = t - x
    do = r * (1 - t^2) * (2/784)
    dh = (do @ D^T) * (h > 0)         [T, F]
    dz = dh @ W1^T                    [T, k]    f32
    v  = m*v + dz;  z = z - lr*v

All of z, v, h and the weights stay VMEM-resident across ALL L steps (the
round-1 post-mortem's lesson: the XLA scan is activation-HBM-bound; v1's
tap-loop was relayout-bound — dense matmuls have no relayouts at all). HBM
traffic per tile = read z0/x/weights once + write z_final once.

The final-restart selection (losses of z_final, per-image argmin, G(z*))
runs OUTSIDE the kernel through the identical XLA dense apply, so selection
semantics match defense/project.py exactly. Transposed weight copies are
passed in pre-transposed — transposing inside the kernel would be a VMEM
relayout per step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class DensePack(NamedTuple):
    w1: jnp.ndarray    # [k, F] bf16 (BN folded)
    w1t: jnp.ndarray   # [F, k] bf16
    b1: jnp.ndarray    # [1, F] f32
    d: jnp.ndarray     # [F, P] bf16 (output padded to P lanes)
    dt: jnp.ndarray    # [P, F] bf16
    bd: jnp.ndarray    # [1, P] f32
    out_dim: int       # true (unpadded) output dim, e.g. 784
    z_dim: int


def pack_dense(gan) -> DensePack:
    """Dense-pack the gan's frozen wide generator (fastgen probing)."""
    from defensegan_tpu.defense.fastgen import pack_generator

    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, variant="dense")
    d_mat, b_d = packed.dense
    out_dim = d_mat.shape[1]
    pad = _round_up(out_dim, LANE) - out_dim
    d_f32 = np.asarray(d_mat, np.float32)
    bd_f32 = np.asarray(b_d, np.float32)
    d_pad = np.pad(d_f32, ((0, 0), (0, pad)))
    bd_pad = np.pad(bd_f32, (0, pad))
    w1 = np.asarray(packed.w_fc, np.float32)
    b1 = np.asarray(packed.b_fc, np.float32)
    return DensePack(
        w1=jnp.asarray(w1, jnp.bfloat16),
        w1t=jnp.asarray(w1.T.copy(), jnp.bfloat16),
        b1=jnp.asarray(b1[None, :], jnp.float32),
        d=jnp.asarray(d_pad, jnp.bfloat16),
        dt=jnp.asarray(d_pad.T.copy(), jnp.bfloat16),
        bd=jnp.asarray(bd_pad[None, :], jnp.float32),
        out_dim=out_dim,
        z_dim=w1.shape[0],
    )


def _loop_kernel(z_ref, x_ref, w1_ref, w1t_ref, b1_ref, d_ref, dt_ref,
                 bd_ref, zout_ref, *, rec_iters: int, rec_lr: float,
                 momentum: float, out_dim: int):
    """One tile: run all L momentum-GD steps with everything VMEM-resident."""
    w1 = w1_ref[:]
    w1t = w1t_ref[:]
    b1 = b1_ref[:]
    d = d_ref[:]
    dt = dt_ref[:]
    bd = bd_ref[:]
    x = x_ref[:]                       # [T, P] bf16 (zero-padded cols)
    scale = 2.0 / out_dim

    def step(_, carry):
        z, v = carry                   # f32 [T, k]
        zb = z.astype(jnp.bfloat16)
        h = jnp.maximum(
            jnp.dot(zb, w1, preferred_element_type=jnp.float32) + b1, 0.0)
        hb = h.astype(jnp.bfloat16)
        o = jnp.dot(hb, d, preferred_element_type=jnp.float32) + bd
        t = jnp.tanh(o)
        r = t - x.astype(jnp.float32)  # padded cols: t=0, x=0 -> r=0
        do = (r * (1.0 - t * t) * scale).astype(jnp.bfloat16)
        dh = jnp.dot(do, dt, preferred_element_type=jnp.float32)
        dh = jnp.where(h > 0.0, dh, 0.0).astype(jnp.bfloat16)
        dz = jnp.dot(dh, w1t, preferred_element_type=jnp.float32)
        v = momentum * v + dz
        z = z - rec_lr * v
        return (z, v)

    z0 = z_ref[:]
    z_fin, _ = jax.lax.fori_loop(0, rec_iters, step,
                                 (z0, jnp.zeros_like(z0)))
    zout_ref[:] = z_fin


def fused_projection_dense(pack: DensePack, x_flat_tanh: jnp.ndarray,
                           z0_flat: jnp.ndarray, *, rec_iters: int,
                           rec_lr: float, momentum: float,
                           tile: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """Run the L-step loop for all N latents; returns z_final [N, k].

    x_flat_tanh: [N, out_dim] images in TANH space, float32 or bf16.
    z0_flat:     [N, k] float32 initial latents. N % tile must be 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = z0_flat.shape
    if n % tile:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    p = pack.d.shape[1]
    pad = p - x_flat_tanh.shape[1]
    x16 = jnp.pad(x_flat_tanh.astype(jnp.bfloat16), ((0, 0), (0, pad)))

    kernel = functools.partial(
        _loop_kernel, rec_iters=rec_iters, rec_lr=rec_lr,
        momentum=momentum, out_dim=pack.out_dim)

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
            full(pack.w1), full(pack.w1t), full(pack.b1),
            full(pack.d), full(pack.dt), full(pack.bd),
        ],
        out_specs=blocked(k),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return f(z0_flat, x16, pack.w1, pack.w1t, pack.b1, pack.d, pack.dt,
             pack.bd)


def make_pallas_dense_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                                    rec_lr: float, momentum: float,
                                    tile: int = 512,
                                    interpret: bool = False):
    """Jitted f(x, key, z0=None) -> ReconstructionResult on the fused dense
    kernel.

    Drop-in for DefenseGAN.reconstruct (back_prop=False). Restart selection
    and G(z*) run in XLA on the same dense pack, so argmin semantics are
    identical to defense/project.py. z0 ([B, R, k], e.g. an encoder-init
    policy — defense/encoder_init.py) overrides the internal N(0, I)
    sampling; it enters the pallas_call as a plain runtime input, so no
    new Mosaic compile is involved.
    """
    from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                pack_generator)
    from defensegan_tpu.defense.project import (ReconstructionResult,
                                                sample_z0)
    from defensegan_tpu.models.generator import (from_image_space,
                                                 to_image_space)

    pack = pack_dense(gan)
    apply_flat = make_packed_apply(pack_generator(
        gan.generator, gan.state.gen_params, gan.state.gen_stats,
        variant="dense"))
    z_dim = pack.z_dim
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
        z_fin = fused_projection_dense(
            pack, x_rep, z0, rec_iters=rec_iters, rec_lr=rec_lr,
            momentum=momentum, tile=tile, interpret=interpret)
        # final losses + argmin restart + G(z*): identical XLA epilogue to
        # defense/project.py::reconstruct
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


def dense_kernel_available(gan) -> bool:
    """v2 kernel covers single-deconv (wide) generators only, and only up
    to the dense-packing feature bound: pack_generator(variant='dense')
    raises above feat = base_hw^2 * channels[0] > 16384 (the identity
    probe materializes a [feat, 4*feat] matrix — fastgen.py), so oversized
    wide topologies must degrade to the packed/XLA path instead of
    crashing inside make_pallas_dense_*_reconstructor."""
    gen = gan.generator
    if len(gen.channels) != 1:
        return False
    feat = gen.base_hw * gen.base_hw * gen.channels[0]
    return feat <= 16384
