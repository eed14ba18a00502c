"""Multi-device (8 virtual CPU) sharding tests for training and defense.

SURVEY.md section 4 item (e): pjit/shard_map semantics validated on an
8-device host-platform mesh. The reference has no distributed path at all
(single tf.Session); these tests cover the new TPU-native DP design."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from defensegan_tpu.defense import reconstruct, sample_z0
from defensegan_tpu.gan.train import (build_optimizers, init_gan_state,
                                      make_train_step)
from defensegan_tpu.models import critic_for, generator_for
from defensegan_tpu.parallel import (batch_sharding, make_mesh,
                                     replicated_sharding, shard_batch)

Z = 16
SHAPE = (28, 28, 1)


def test_make_mesh(eight_devices):
    mesh = make_mesh()
    assert mesh.shape["data"] == len(eight_devices)
    mesh4 = make_mesh(4)
    assert mesh4.shape["data"] == 4


def test_sharded_train_step_matches_single_device(eight_devices):
    """DP gradient psum must reproduce the single-device update exactly
    (fp tolerance) — params replicated, batch sharded."""
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(0), SHAPE, Z,
                           gen_tx, disc_tx)
    step = make_train_step(gen, critic, gen_tx, disc_tx, latent_dim=Z,
                           disc_iters=2)
    batch = jnp.asarray(
        np.random.RandomState(0).rand(2, 16, *SHAPE).astype(np.float32))
    key = jax.random.key(3)

    # single device
    s_ref, m_ref = jax.jit(step)(state, batch, key)

    # 8-device mesh: batch axis (dim 1) sharded, state replicated
    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    state_sh = jax.device_put(state, rep)
    batch_sh = jax.device_put(batch, NamedSharding(mesh, P(None, "data")))
    s_dp, m_dp = jax.jit(step)(state_sh, batch_sh, jax.device_put(key, rep))

    np.testing.assert_allclose(float(m_ref["d_loss"]), float(m_dp["d_loss"]),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(s_ref.gen_params),
                    jax.tree.leaves(s_dp.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_sharded_reconstruct_matches_single_device(eight_devices):
    """Projection with batch*restarts sharded over the mesh == local result."""
    gen = generator_for("mnist", dim=4)
    variables = gen.init(jax.random.key(0), jnp.zeros((1, Z)), train=True)

    def gen_apply(z):
        return gen.apply(variables, z, train=False)

    x = jnp.asarray(np.random.RandomState(1).rand(8, *SHAPE)
                    .astype(np.float32))
    z0 = sample_z0(jax.random.key(2), 8, 2, Z)

    run = jax.jit(lambda x, z0: reconstruct(gen_apply, x, z0, rec_iters=8))
    ref = run(x, z0)

    mesh = make_mesh()
    x_sh = jax.device_put(x, batch_sharding(mesh, x.ndim))
    z0_sh = jax.device_put(z0, batch_sharding(mesh, z0.ndim))
    dp = run(x_sh, z0_sh)
    np.testing.assert_allclose(np.asarray(ref.x_hat), np.asarray(dp.x_hat),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.all_losses).argmin(1),
                                  np.asarray(dp.all_losses).argmin(1))


def test_shard_batch_helper(eight_devices):
    mesh = make_mesh()
    arrs = {"x": jnp.zeros((16, 4)), "y": jnp.zeros((16,))}
    sharded = shard_batch(mesh, arrs)
    for v in jax.tree.leaves(sharded):
        assert v.sharding.spec[0] == "data"
