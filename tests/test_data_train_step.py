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


def test_data_train_step_on_mesh(eight_devices):
    state, step, data = _setup()
    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    f = jax.jit(lambda s, d, k: step(s, d, k, mesh=mesh))
    s1, m1 = f(jax.device_put(state, rep), jax.device_put(data, rep),
               jax.device_put(jax.random.key(5), rep))
    assert np.isfinite(float(m1["d_loss"]))
    assert int(s1.step) == 1
