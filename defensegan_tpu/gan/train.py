"""Jitted WGAN-GP training step, data-parallel over a jax Mesh.

Reference parity: models/gan.py::DefenseGANBase.train of kabkabm/defensegan
(~L200-350): n_critic critic steps per generator step, Adam optimizers,
gradient penalty.

TPU-first design (NOT a translation of the per-sess.run TF1 loop):
  - the whole (disc_iters critic updates + 1 generator update) cycle is ONE
    jitted function: the critic inner loop is a `lax.scan`, RNG is on-device
    (jax.random), and the training batch for all critic iterations arrives as
    a single [disc_iters, B, ...] array — zero host round-trips per cycle;
  - data parallelism: batch sharded on its batch axis over the `data` mesh
    axis, params/opt-state replicated; XLA GSPMD inserts the gradient psum;
  - generator BatchNorm runs in batch-stats mode during training; the moving
    averages that the defense later uses are updated on the generator step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from defensegan_tpu.gan.losses import critic_loss_fn, generator_loss_fn
from defensegan_tpu.models.generator import from_image_space


class GANState(struct.PyTreeNode):
    """Replicated training state (params + optimizer states + BN stats)."""

    step: jnp.ndarray
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any


def build_optimizers(gen_lr: float = 1e-4, disc_lr: float = 1e-4,
                     beta1: float = 0.5, beta2: float = 0.9):
    """Canonical WGAN-GP Adam pair (arXiv:1704.00028)."""
    gen_tx = optax.adam(gen_lr, b1=beta1, b2=beta2)
    disc_tx = optax.adam(disc_lr, b1=beta1, b2=beta2)
    return gen_tx, disc_tx


def init_gan_state(generator: nn.Module, critic: nn.Module, key: jax.Array,
                   image_shape: Tuple[int, int, int], latent_dim: int,
                   gen_tx: optax.GradientTransformation,
                   disc_tx: optax.GradientTransformation) -> GANState:
    kg, kd = jax.random.split(key)
    z = jnp.zeros((1, latent_dim), jnp.float32)
    x = jnp.zeros((1,) + tuple(image_shape), jnp.float32)
    gen_vars = generator.init(kg, z, train=True)
    disc_vars = critic.init(kd, x)
    gen_params = gen_vars["params"]
    gen_stats = gen_vars.get("batch_stats", {})
    disc_params = disc_vars["params"]
    return GANState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_stats=gen_stats,
        disc_params=disc_params,
        gen_opt_state=gen_tx.init(gen_params),
        disc_opt_state=disc_tx.init(disc_params),
    )


def make_train_step(
    generator: nn.Module,
    critic: nn.Module,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    latent_dim: int,
    disc_iters: int = 5,
    gp_lambda: float = 10.0,
    axis_name: str = None,
) -> Callable[[GANState, jnp.ndarray, jax.Array],
              Tuple[GANState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step.

    Returned fn: (state, real_images [disc_iters, B, H, W, C] in [0,1], key)
    -> (state, metrics). Each critic iteration consumes its own minibatch
    slice, matching the reference's fresh batch per critic step.

    axis_name: set when running under shard_map/pmap (explicit-collective
    DP, the multi-host path — see parallel/distributed.py): gradients and
    metrics are pmean'd over the axis and the per-shard RNG stream is
    decorrelated via the shard index. Leave None under jit/GSPMD, where XLA
    inserts the psum from the sharding constraints instead.
    """

    def _sync_grads(grads):
        if axis_name is not None:
            return jax.lax.pmean(grads, axis_name)
        return grads

    def gen_fake(gen_params, gen_stats, z, mutable: bool):
        variables = {"params": gen_params, "batch_stats": gen_stats}
        if mutable:
            fake, updates = generator.apply(variables, z, train=True,
                                            mutable=["batch_stats"])
            return fake, updates["batch_stats"]
        fake = generator.apply(variables, z, train=True,
                               mutable=["batch_stats"])[0]
        return fake, gen_stats

    def critic_step(carry, inp):
        disc_params, disc_opt_state, gen_params, gen_stats = carry
        real, key = inp
        kz, ke = jax.random.split(key)
        batch = real.shape[0]
        z = jax.random.normal(kz, (batch, latent_dim), jnp.float32)
        fake, _ = gen_fake(gen_params, gen_stats, z, mutable=False)
        fake = jax.lax.stop_gradient(fake)
        eps = jax.random.uniform(ke, (batch,), jnp.float32)

        def loss_fn(dp):
            def critic_apply(img):
                return critic.apply({"params": dp}, img)
            return critic_loss_fn(critic_apply, real, fake, eps,
                                  gp_lambda=gp_lambda)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_params)
        grads = _sync_grads(grads)
        updates, disc_opt_state = disc_tx.update(grads, disc_opt_state,
                                                 disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        aux = dict(aux, d_loss=loss)
        return (disc_params, disc_opt_state, gen_params, gen_stats), aux

    def train_step(state: GANState, real_images: jnp.ndarray,
                   key: jax.Array):
        real = from_image_space(real_images)
        if axis_name is not None:
            # decorrelate the per-shard z/eps streams (under GSPMD the
            # single logical program already does this implicitly)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_disc, k_gen = jax.random.split(key)
        disc_keys = jax.random.split(k_disc, disc_iters)

        carry = (state.disc_params, state.disc_opt_state,
                 state.gen_params, state.gen_stats)
        carry, disc_metrics = jax.lax.scan(critic_step, carry,
                                           (real, disc_keys))
        disc_params, disc_opt_state, _, _ = carry

        batch = real.shape[1]
        z = jax.random.normal(k_gen, (batch, latent_dim), jnp.float32)

        def gen_loss_fn(gp):
            fake, new_stats = gen_fake(gp, state.gen_stats, z, mutable=True)

            def critic_apply(img):
                return critic.apply({"params": disc_params}, img)
            return generator_loss_fn(critic_apply, fake), new_stats

        (g_loss, gen_stats), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        grads = _sync_grads(grads)
        if axis_name is not None:
            # keep BN running averages identical across shards
            gen_stats = jax.lax.pmean(gen_stats, axis_name)
        updates, gen_opt_state = gen_tx.update(grads, state.gen_opt_state,
                                               state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        metrics = {k: v[-1] for k, v in disc_metrics.items()}
        metrics["g_loss"] = g_loss
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_stats=gen_stats,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    return train_step


def make_data_train_step(generator: nn.Module, critic: nn.Module,
                         gen_tx: optax.GradientTransformation,
                         disc_tx: optax.GradientTransformation, *,
                         latent_dim: int, batch_size: int,
                         disc_iters: int = 5, gp_lambda: float = 10.0):
    """Train step that samples minibatches ON-DEVICE from a resident dataset.

    fn(state, data [N,H,W,C] in [0,1] device-resident, key) -> (state,
    metrics). Eliminates the per-step host->device batch transfer of the
    reference's feed_dict loop entirely (SURVEY.md section 3.1): the host
    sends only a PRNG key per cycle; indices are drawn with replacement
    inside jit and gathered on-device.

    SEMANTIC DIFFERENCE vs the reference (documented deliberately): the
    reference iterates epochs of a shuffled dataset, so every example is
    seen exactly once per epoch; this step samples minibatches i.i.d. WITH
    replacement. For WGAN-GP training the two are equivalent in
    expectation (each example has identical marginal probability per
    batch), and with-replacement sampling keeps the step a pure function
    of (state, key) — no epoch cursor to carry or checkpoint. Coverage is
    near-complete after a fraction of an epoch-equivalent: after S steps
    of batch B over N examples, E[uncovered] = N*(1-B/N)^(S*disc_iters)
    — e.g. N=60000, B=64, 5 critic draws/step: <0.7% unseen after one
    epoch-equivalent of generator steps (tests/test_gan_train.py pins
    this).
    """
    inner = make_train_step(generator, critic, gen_tx, disc_tx,
                            latent_dim=latent_dim, disc_iters=disc_iters,
                            gp_lambda=gp_lambda)

    def train_step(state: GANState, data: jnp.ndarray, key: jax.Array,
                   mesh=None):
        k_idx, k_step = jax.random.split(key)
        idx = jax.random.randint(k_idx, (disc_iters, batch_size), 0,
                                 data.shape[0])
        real = data[idx]  # [disc_iters, B, H, W, C] gathered on-device
        if real.dtype == jnp.uint8:
            # uint8 device-resident datasets (CelebA/ImageNet-64 scale):
            # normalize per minibatch inside the jitted step — 4x less HBM
            # than a float32-resident copy
            real = real.astype(jnp.float32) / 255.0
        if mesh is not None:
            # DP: pin the per-critic-iter batch axis onto the data mesh axis
            from jax.sharding import NamedSharding, PartitionSpec as P
            real = jax.lax.with_sharding_constraint(
                real, NamedSharding(mesh, P(None, "data")))
        return inner(state, real, k_step)

    return train_step
