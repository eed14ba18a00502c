"""Scientific validation of gradients THROUGH the unrolled defense
(the property white-box attacks rely on; reference builds this with
back_prop=True manual unrolling in models/gan.py). Checks jax.grad through
the lax.scan projection against finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.defense import reconstruct
from defensegan_tpu.models import generator_for

Z = 12


def test_grad_through_defense_matches_forward_mode():
    """Reverse-mode grad through the checkpointed scan vs forward-mode jvp —
    two independent autodiff paths must give the same directional
    derivative. (f32 finite differences sit at the cancellation noise floor
    here, so jvp is the exact oracle.)"""
    gen = generator_for("mnist", dim=4)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, Z)), train=True)

    def gen_apply(z):
        return gen.apply(variables, z, train=False)

    x = jax.random.uniform(jax.random.key(1), (2, 28, 28, 1))
    z0 = jax.random.normal(jax.random.key(2), (2, 2, Z)) * 0.5

    def f(x):
        res = reconstruct(gen_apply, x, z0, rec_iters=8, rec_lr=1.0,
                          momentum=0.7, back_prop=True)
        return jnp.sum(res.x_hat ** 2)

    g = jax.grad(f)(x)
    for seed in range(3):
        d = jax.random.normal(jax.random.key(10 + seed), x.shape)
        _, jvp_val = jax.jvp(f, (x,), (d,))
        vjp_dir = jnp.vdot(g, d)
        np.testing.assert_allclose(float(vjp_dir), float(jvp_val),
                                   rtol=2e-3, atol=1e-5)


def test_checkpointed_grad_matches_unchecckpointed_value():
    """back_prop=True uses jax.checkpoint; the rematerialized gradient must
    equal the plain one (here: compare against a hand-unrolled loop)."""
    gen = generator_for("mnist", dim=4)
    variables = gen.init(jax.random.key(3), jnp.zeros((1, Z)), train=True)

    def gen_apply(z):
        return gen.apply(variables, z, train=False)

    x = jax.random.uniform(jax.random.key(4), (2, 28, 28, 1))
    z0 = jax.random.normal(jax.random.key(5), (2, 1, Z)) * 0.5
    L, lr, mom = 5, 1.0, 0.7

    def f_scan(x):
        res = reconstruct(gen_apply, x, z0, rec_iters=L, rec_lr=lr,
                          momentum=mom, back_prop=True)
        return jnp.sum(res.x_hat)

    def f_unrolled(x):
        x_t = 2.0 * x - 1.0
        z = z0[:, 0, :]
        v = jnp.zeros_like(z)
        for _ in range(L):  # plain python unroll, no checkpoint
            g = jax.grad(lambda zz: jnp.sum(jnp.mean(
                (gen_apply(zz) - x_t) ** 2, axis=(1, 2, 3))))(z)
            v = mom * v + g
            z = z - lr * v
        return jnp.sum((gen_apply(z) + 1.0) * 0.5)

    g_scan = jax.grad(f_scan)(x)
    g_unrolled = jax.grad(f_unrolled)(x)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_unrolled),
                               rtol=1e-4, atol=1e-6)
