"""Explicit-collective (shard_map) DP train step + multi-host bootstrap
plumbing (parallel/distributed.py) on the 8-virtual-device CPU mesh.

The GSPMD path is exact-match tested in test_parallel.py; the shard_map
variant uses per-shard RNG (decorrelated z/eps draws), so it is validated
for replication invariants and training behavior rather than bitwise
equality with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.gan.train import (build_optimizers, init_gan_state,
                                      make_train_step)
from defensegan_tpu.models import critic_for, generator_for
from defensegan_tpu.parallel import (global_batch_sharding,
                                     initialize_distributed, make_mesh,
                                     make_shard_map_train_step,
                                     replicated_sharding)

Z = 16
SHAPE = (28, 28, 1)


def _setup(key=0):
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(key), SHAPE, Z,
                           gen_tx, disc_tx)
    return gen, critic, gen_tx, disc_tx, state


def test_initialize_distributed_single_process_noop():
    pid, count = initialize_distributed()
    assert pid == 0 and count == 1


@pytest.mark.slow
def test_two_process_multihost_smoke():
    """Real multi-process path: 2 OS processes + jax.distributed merge into
    one 8-device mesh running the shard_map step (slow ~1 min)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multihost_smoke.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = ""
    out = subprocess.run([sys.executable, script], env=env, timeout=600,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST_OK processes=2 devices=8" in out.stdout


def test_shard_map_step_runs_and_replicates(eight_devices):
    gen, critic, gen_tx, disc_tx, state = _setup()
    mesh = make_mesh()
    step = make_shard_map_train_step(gen, critic, gen_tx, disc_tx,
                                     latent_dim=Z, disc_iters=2, mesh=mesh)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    batch = jnp.asarray(
        np.random.RandomState(0).rand(2, 16, *SHAPE).astype(np.float32))
    batch = jax.device_put(batch, global_batch_sharding(mesh))
    key = jax.device_put(jax.random.key(1), rep)

    new_state, metrics = step(state, batch, key)
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert int(new_state.step) == 1

    # params must be IDENTICAL on every shard after the pmean'd update —
    # the replication invariant explicit-collective DP must maintain
    leaf = jax.tree.leaves(new_state.gen_params)[0]
    per_dev = [np.asarray(s.data) for s in leaf.addressable_shards]
    for a in per_dev[1:]:
        np.testing.assert_array_equal(per_dev[0], a)


def test_shard_map_step_trains(eight_devices):
    """A few shard_map steps must move the critic the right way (finite,
    changing losses; params actually update)."""
    gen, critic, gen_tx, disc_tx, state = _setup()
    mesh = make_mesh()
    step = make_shard_map_train_step(gen, critic, gen_tx, disc_tx,
                                     latent_dim=Z, disc_iters=2, mesh=mesh)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    rng = np.random.RandomState(1)
    p0 = np.asarray(jax.tree.leaves(state.gen_params)[0]).copy()
    key = jax.device_put(jax.random.key(2), rep)
    for i in range(3):
        batch = jax.device_put(
            jnp.asarray(rng.rand(2, 16, *SHAPE).astype(np.float32)),
            global_batch_sharding(mesh))
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        assert all(np.isfinite(float(v)) for v in metrics.values())
    assert int(state.step) == 3
    p3 = np.asarray(jax.tree.leaves(state.gen_params)[0])
    assert not np.allclose(p0, p3)
