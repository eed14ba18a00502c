"""Device-resident data path of WGAN training (gan/train.py::
make_data_train_step) — the TPU-first replacement of the reference's
per-sess.run feed_dict loop (SURVEY.md section 3.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.gan.train import (build_optimizers, init_gan_state,
                                      make_data_train_step)
from defensegan_tpu.models import critic_for, generator_for
from defensegan_tpu.parallel import make_mesh, replicated_sharding

Z = 16
SHAPE = (28, 28, 1)


def _setup():
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(0), SHAPE, Z,
                           gen_tx, disc_tx)
    step = make_data_train_step(gen, critic, gen_tx, disc_tx, latent_dim=Z,
                                batch_size=8, disc_iters=2)
    data = jnp.asarray(
        np.random.RandomState(0).rand(64, *SHAPE).astype(np.float32))
    return state, step, data


def test_data_train_step_runs_and_is_deterministic():
    state, step, data = _setup()
    f = jax.jit(lambda s, d, k: step(s, d, k))
    s1, m1 = f(state, data, jax.random.key(5))
    s2, m2 = f(state, data, jax.random.key(5))
    assert int(s1.step) == 1
    np.testing.assert_array_equal(np.asarray(m1["d_loss"]),
                                  np.asarray(m2["d_loss"]))
    # different key -> different sampled batches -> different loss
    _, m3 = f(state, data, jax.random.key(6))
    assert float(m1["d_loss"]) != float(m3["d_loss"])


def test_with_replacement_sampling_covers_dataset():
    """The on-device minibatch sampler draws i.i.d. WITH replacement — a
    documented semantic difference from the reference's epoch iteration
    (gan/train.py::make_data_train_step docstring). This pins the coverage
    claim: after one epoch-equivalent of draws, nearly every example has
    been sampled at least once (E[uncovered] = N*(1-B/N)^draws)."""
    n, batch, disc_iters = 4096, 64, 5
    steps = n // batch  # one epoch-equivalent of GENERATOR steps
    key = jax.random.key(0)
    seen = np.zeros(n, bool)
    for s in range(steps):
        k_idx, _ = jax.random.split(jax.random.fold_in(key, s))
        idx = jax.random.randint(k_idx, (disc_iters, batch), 0, n)
        seen[np.asarray(idx).ravel()] = True
    # analytic expectation: steps*disc_iters*batch = 5N draws, so
    # E[unseen] = (1-1/N)^(5N) ~ e^-5 ~ 0.7%; assert with slack
    assert seen.mean() > 0.97, f"coverage too low: {seen.mean():.3f}"


def test_data_train_step_on_mesh(eight_devices):
    state, step, data = _setup()
    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    f = jax.jit(lambda s, d, k: step(s, d, k, mesh=mesh))
    s1, m1 = f(jax.device_put(state, rep), jax.device_put(data, rep),
               jax.device_put(jax.random.key(5), rep))
    assert np.isfinite(float(m1["d_loss"]))
    assert int(s1.step) == 1
