"""Tests for the projection core (reference semantics: models/gan.py
DefenseGANBase.reconstruct of kabkabm/defensegan, ~L350-500).

Covers SURVEY.md section 4 build requirements (b) fixed-point recovery,
(c) restart argmin selection, plus momentum-SGD semantics vs a hand-rolled
numpy loop and differentiability w.r.t. the input when back_prop=True.
"""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.defense import reconstruct, sample_z0
from defensegan_tpu.models import generator_for
from defensegan_tpu.models.generator import to_image_space

Z_DIM = 16


def _tiny_gen():
    gen = generator_for("mnist", dim=4)
    z = jnp.zeros((1, Z_DIM))
    variables = gen.init(jax.random.key(0), z, train=True)

    def gen_apply(zz):
        return gen.apply(variables, zz, train=False)

    return gen_apply


def test_in_range_image_recovers():
    """(b): starting near z_true on x = G(z_true), loss -> ~0."""
    gen_apply = _tiny_gen()
    z_true = jax.random.normal(jax.random.key(1), (3, Z_DIM))
    x = to_image_space(gen_apply(z_true))
    z0 = (z_true + 0.05 * jax.random.normal(jax.random.key(2),
                                            z_true.shape))[:, None, :]
    res = reconstruct(gen_apply, x, z0, rec_iters=200, rec_lr=1.0,
                      momentum=0.7)
    assert res.x_hat.shape == x.shape
    np.testing.assert_array_less(np.asarray(res.loss), 1e-3)
    np.testing.assert_allclose(np.asarray(res.x_hat), np.asarray(x),
                               atol=0.05)


def test_argmin_selects_best_restart():
    """(c): with L=0, the restart equal to z_true must win."""
    gen_apply = _tiny_gen()
    z_true = jax.random.normal(jax.random.key(3), (4, Z_DIM))
    x = to_image_space(gen_apply(z_true))
    rr = 5
    z0 = jax.random.normal(jax.random.key(4), (4, rr, Z_DIM)) * 3.0
    winner = 2
    z0 = z0.at[:, winner, :].set(z_true)
    res = reconstruct(gen_apply, x, z0, rec_iters=0)
    assert res.all_losses.shape == (4, rr)
    np.testing.assert_array_equal(
        np.argmin(np.asarray(res.all_losses), axis=1), winner)
    np.testing.assert_allclose(np.asarray(res.z_star), np.asarray(z_true),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_less(np.asarray(res.loss), 1e-8)


def test_momentum_semantics_match_tf_momentum_optimizer():
    """v <- m*v + g; z <- z - lr*v (tf.train.MomentumOptimizer), checked
    against a hand-rolled numpy loop on a linear 'generator'."""
    H = W = 4
    A = np.random.RandomState(0).randn(Z_DIM, H * W).astype(np.float32)

    def gen_apply(z):
        return (z @ jnp.asarray(A)).reshape(z.shape[0], H, W, 1)

    x_img = np.random.RandomState(1).rand(2, H, W, 1).astype(np.float32)
    z0 = np.random.RandomState(2).randn(2, 1, Z_DIM).astype(np.float32)
    lr, mom, L = 0.37, 0.7, 7

    res = reconstruct(gen_apply, jnp.asarray(x_img), jnp.asarray(z0),
                      rec_iters=L, rec_lr=lr, momentum=mom)

    # numpy replica (in tanh space: x_tanh = 2x-1, per-image MEAN sq err)
    x_t = (2.0 * x_img - 1.0).reshape(2, -1)
    z = z0[:, 0, :].copy()
    v = np.zeros_like(z)
    npx = H * W
    for _ in range(L):
        diff = z @ A - x_t                       # [2, HW]
        g = (2.0 / npx) * diff @ A.T             # grad of mean-sq-err
        v = mom * v + g
        z = z - lr * v
    np.testing.assert_allclose(np.asarray(res.z_star), z, rtol=1e-4,
                               atol=1e-4)


def test_back_prop_gradients_flow_to_input():
    gen_apply = _tiny_gen()
    x = jnp.clip(to_image_space(gen_apply(
        jax.random.normal(jax.random.key(5), (2, Z_DIM)))), 0.0, 1.0)
    z0 = sample_z0(jax.random.key(6), 2, 2, Z_DIM)

    def recon_sum(x, back_prop):
        res = reconstruct(gen_apply, x, z0, rec_iters=5, back_prop=back_prop)
        return jnp.sum(res.x_hat)

    g_on = jax.grad(lambda xx: recon_sum(xx, True))(x)
    g_off = jax.grad(lambda xx: recon_sum(xx, False))(x)
    assert float(jnp.max(jnp.abs(g_on))) > 0.0
    np.testing.assert_array_equal(np.asarray(g_off), 0.0)


def test_reconstruct_jits_and_is_deterministic():
    gen_apply = _tiny_gen()
    x = jnp.clip(to_image_space(gen_apply(
        jax.random.normal(jax.random.key(7), (2, Z_DIM)))), 0.0, 1.0)
    z0 = sample_z0(jax.random.key(8), 2, 3, Z_DIM)
    f = jax.jit(lambda x, z0: reconstruct(gen_apply, x, z0, rec_iters=10))
    r1 = f(x, z0)
    r2 = f(x, z0)
    np.testing.assert_array_equal(np.asarray(r1.x_hat), np.asarray(r2.x_hat))
