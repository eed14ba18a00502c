"""Projection onto the generator manifold: z* = argmin_z ||G(z) - x||^2.

This is THE core of Defense-GAN. Reference parity:
models/gan.py::DefenseGANBase.reconstruct of kabkabm/defensegan (~L350-500):

  - tile x across R = rec_rr random restarts, init z ~ N(0, I)        [B*R, k]
  - L = rec_iters steps of SGD with momentum (momentum=0.7, lr=rec_lr=10.0)
    on the per-image mean-squared reconstruction error in the generator's
    [-1, 1] tanh space
  - per image, keep the restart with the lowest FINAL loss
  - back_prop=True builds a differentiable graph so white-box attacks can
    differentiate through the unrolled optimization w.r.t. the INPUT x

TPU-first design (NOT a translation of the TF1 unrolled graph):

  - restarts are folded into the batch axis: the generator runs on a single
    [B*R, k] batch so the MXU sees one large matmul/conv per layer instead of
    R small ones;
  - the L-step loop is a single `lax.scan` — traced once, compiled once, zero
    host round-trips, O(1) program size in L (the reference pays O(L) graph
    nodes when back_prop=True);
  - gradients w.r.t. x through the loop use `jax.checkpoint` on the scan body,
    so memory is O(sqrt-free single-step residuals x L) via recomputation
    instead of the reference's O(L) full-graph residency;
  - momentum update matches tf.train.MomentumOptimizer semantics:
        v <- momentum * v + g;  z <- z - lr * v

Images at this API are in [0, 1] (classifier/attack space); conversion to the
generator's tanh space happens inside.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from defensegan_tpu.models.generator import from_image_space, to_image_space

# gen_apply: z [N, k] -> images [N, H, W, C] in tanh space [-1, 1]
GenApply = Callable[[jnp.ndarray], jnp.ndarray]


class ReconstructionResult(NamedTuple):
    """Output of `reconstruct`.

    x_hat:      [B, H, W, C] best-restart reconstruction, [0, 1] image space.
    z_star:     [B, k] best-restart latent.
    loss:       [B] final per-image reconstruction MSE (tanh space).
    all_losses: [B, R] final loss of every restart (argmin picks the winner).
    """

    x_hat: jnp.ndarray
    z_star: jnp.ndarray
    loss: jnp.ndarray
    all_losses: jnp.ndarray


def sample_z0(key: jax.Array, batch: int, rec_rr: int, z_dim: int,
              dtype=jnp.float32) -> jnp.ndarray:
    """z0 ~ N(0, I), shape [B, R, k] (reference inits z variables the same way)."""
    return jax.random.normal(key, (batch, rec_rr, z_dim), dtype=dtype)


def _rec_losses(gen_apply: GenApply, z_flat: jnp.ndarray,
                x_flat: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean-squared error in tanh space, shape [B*R]."""
    g = gen_apply(z_flat)
    d = (g - x_flat).astype(jnp.float32)
    return jnp.mean(jnp.square(d), axis=tuple(range(1, d.ndim)))


def reconstruct(
    gen_apply: GenApply,
    x: jnp.ndarray,
    z0: jnp.ndarray,
    *,
    rec_iters: int = 200,
    rec_lr: float = 10.0,
    momentum: float = 0.7,
    back_prop: bool = False,
    unroll: int = 8,
) -> ReconstructionResult:
    """Project x onto the generator manifold (reference: gan.py reconstruct).

    Args:
      gen_apply: frozen generator, z [N, k] -> tanh-space images [N, H, W, C].
      x: [B, H, W, C] inputs in [0, 1] image space.
      z0: [B, R, k] initial latents (from `sample_z0`).
      rec_iters: L, number of gradient-descent steps (reference default 200).
      rec_lr: learning rate (reference default 10.0).
      momentum: heavy-ball momentum (reference default 0.7).
      back_prop: if True the result is differentiable w.r.t. x (white-box
        attacks differentiate through the unrolled loop); if False gradients
        are stopped, matching the reference's inference graph.
      unroll: scan unroll factor — lets XLA fuse elementwise work across
        consecutive GD steps (perf knob; no semantic effect).

    Returns:
      ReconstructionResult with x_hat in [0, 1] image space.
    """
    batch, rr, z_dim = z0.shape
    x_tanh = from_image_space(x)
    # Fold restarts into the batch axis: one big generator batch per step.
    x_flat = jnp.broadcast_to(x_tanh[:, None], (batch, rr) + x_tanh.shape[1:])
    x_flat = x_flat.reshape((batch * rr,) + x_tanh.shape[1:])
    z_flat = z0.reshape(batch * rr, z_dim)

    def sum_loss(z, x_target):
        return jnp.sum(_rec_losses(gen_apply, z, x_target))

    grad_z = jax.grad(sum_loss, argnums=0)

    def step(carry, _):
        z, v = carry
        g = grad_z(z, x_flat)
        v = momentum * v + g          # tf.train.MomentumOptimizer accumulator
        z = z - rec_lr * v
        return (z, v), None

    if back_prop:
        # O(1)-depth memory via rematerialization instead of the reference's
        # O(L) unrolled-graph residency.
        step = jax.checkpoint(step)

    v0 = jnp.zeros_like(z_flat)
    (z_final, _), _ = jax.lax.scan(step, (z_flat, v0), None,
                                   length=rec_iters,
                                   unroll=min(unroll, max(rec_iters, 1)))

    losses = _rec_losses(gen_apply, z_final, x_flat).reshape(batch, rr)
    best = jnp.argmin(losses, axis=1)                          # [B]
    z_star = z_final.reshape(batch, rr, z_dim)[jnp.arange(batch), best]
    x_hat = to_image_space(gen_apply(z_star))
    loss = losses[jnp.arange(batch), best]

    result = ReconstructionResult(x_hat=x_hat, z_star=z_star, loss=loss,
                                  all_losses=losses)
    if not back_prop:
        result = jax.tree.map(jax.lax.stop_gradient, result)
    return result


def make_reconstructor(
    gen_apply: GenApply,
    *,
    rec_rr: int = 10,
    rec_iters: int = 200,
    rec_lr: float = 10.0,
    momentum: float = 0.7,
    back_prop: bool = False,
    z_dim: int = 128,
):
    """Return a jitted `f(x, key) -> ReconstructionResult`.

    Plays the role of the reference's cached per-`reconstructor_id` graphs: one
    compiled XLA program reused across calls of the same batch shape.
    """

    @jax.jit
    def run(x: jnp.ndarray, key: jax.Array) -> ReconstructionResult:
        z0 = sample_z0(key, x.shape[0], rec_rr, z_dim)
        return reconstruct(gen_apply, x, z0, rec_iters=rec_iters,
                           rec_lr=rec_lr, momentum=momentum,
                           back_prop=back_prop)

    return run
