"""WGAN-GP loss + train-step tests (reference: models/gan.py train of
kabkabm/defensegan; GP per arXiv:1704.00028). SURVEY.md section 4 item (a):
loss/GP values vs hand-computed small cases."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.gan.losses import (critic_loss_fn, generator_loss_fn,
                                       gradient_penalty)
from defensegan_tpu.gan.train import (build_optimizers, init_gan_state,
                                      make_train_step)
from defensegan_tpu.models import critic_for, generator_for

Z = 16
SHAPE = (28, 28, 1)


def test_gradient_penalty_linear_critic_closed_form():
    """D(x) = sum(x): grad is all-ones, norm = sqrt(P), GP = (sqrt(P)-1)^2."""
    def critic_apply(x):
        return jnp.sum(x, axis=(1, 2, 3))

    real = jnp.zeros((4,) + SHAPE)
    fake = jnp.ones((4,) + SHAPE)
    eps = jnp.linspace(0.1, 0.9, 4)
    gp = gradient_penalty(critic_apply, real, fake, eps)
    expected = (np.sqrt(np.prod(SHAPE)) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-5)


def test_critic_and_generator_loss_values():
    """Hand-computed Wasserstein terms with a fixed linear critic."""
    w = 0.5

    def critic_apply(x):
        return w * jnp.sum(x, axis=(1, 2, 3))

    real = jnp.full((2,) + SHAPE, 0.8)
    fake = jnp.full((2,) + SHAPE, 0.2)
    eps = jnp.array([0.5, 0.5])
    p = float(np.prod(SHAPE))
    loss, aux = critic_loss_fn(critic_apply, real, fake, eps, gp_lambda=10.0)
    d_real, d_fake = w * 0.8 * p, w * 0.2 * p
    gp_expected = (np.sqrt(p * w * w) - 1.0) ** 2
    np.testing.assert_allclose(float(aux["d_real"]), d_real, rtol=1e-5)
    np.testing.assert_allclose(float(aux["d_fake"]), d_fake, rtol=1e-5)
    np.testing.assert_allclose(float(loss),
                               d_fake - d_real + 10.0 * gp_expected,
                               rtol=1e-5)
    np.testing.assert_allclose(float(generator_loss_fn(critic_apply, fake)),
                               -d_fake, rtol=1e-5)


def test_train_step_runs_and_updates():
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(0), SHAPE, Z,
                           gen_tx, disc_tx)
    step_fn = jax.jit(make_train_step(gen, critic, gen_tx, disc_tx,
                                      latent_dim=Z, disc_iters=2,
                                      gp_lambda=10.0))
    batch = jnp.asarray(
        np.random.RandomState(0).rand(2, 8, *SHAPE).astype(np.float32))
    new_state, metrics = step_fn(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    for k in ("d_loss", "g_loss", "gp", "wasserstein"):
        assert np.isfinite(float(metrics[k])), k
    # both nets actually moved
    d0 = jax.tree.leaves(state.disc_params)[0]
    d1 = jax.tree.leaves(new_state.disc_params)[0]
    assert float(jnp.max(jnp.abs(d1 - d0))) > 0.0
    g0 = jax.tree.leaves(state.gen_params)[0]
    g1 = jax.tree.leaves(new_state.gen_params)[0]
    assert float(jnp.max(jnp.abs(g1 - g0))) > 0.0
    # BN stats updated on the generator step
    s0 = jax.tree.leaves(state.gen_stats)[0]
    s1 = jax.tree.leaves(new_state.gen_stats)[0]
    assert float(jnp.max(jnp.abs(s1 - s0))) > 0.0


def test_two_steps_deterministic():
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(0), SHAPE, Z,
                           gen_tx, disc_tx)
    step_fn = jax.jit(make_train_step(gen, critic, gen_tx, disc_tx,
                                      latent_dim=Z, disc_iters=2))
    batch = jnp.asarray(
        np.random.RandomState(1).rand(2, 4, *SHAPE).astype(np.float32))
    s1, m1 = step_fn(state, batch, jax.random.key(7))
    s2, m2 = step_fn(state, batch, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(m1["d_loss"]),
                                  np.asarray(m2["d_loss"]))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(s1.gen_params)[0]),
        np.asarray(jax.tree.leaves(s2.gen_params)[0]))
