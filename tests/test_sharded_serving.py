"""Multi-chip serving (parallel/serving.py::ShardedDefenseGAN): the
projection sharded over the mesh via shard_map, composing unchanged with
DefendedPipeline. No reference equivalent — new TPU-native machinery."""

import jax
import numpy as np
import pytest

from defensegan_tpu.configs import Config
from defensegan_tpu.defense import DefendedPipeline
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.parallel import ShardedDefenseGAN, make_mesh


def _tiny_gan():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5)
    return DefenseGAN(cfg)


def test_sharded_reconstruct_matches_per_shard_single_device(eight_devices):
    """Multi-chip result == concat of single-chip runs of each shard with
    the device-folded key — the wrapper adds sharding, not new math."""
    gan = _tiny_gan()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    b_local = 2
    x = np.random.RandomState(0).rand(
        n_dev * b_local, 28, 28, 1).astype(np.float32)
    key = jax.random.key(7)

    sharded = ShardedDefenseGAN(gan, mesh)
    res = sharded.reconstruct(x, key, kernel="xla")

    ref_xhat, ref_loss = [], []
    for i in range(n_dev):
        lo = i * b_local
        r = gan.reconstruct(x[lo:lo + b_local], jax.random.fold_in(key, i),
                            kernel="xla")
        ref_xhat.append(np.asarray(r.x_hat))
        ref_loss.append(np.asarray(r.loss))
    np.testing.assert_allclose(np.asarray(res.x_hat),
                               np.concatenate(ref_xhat), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.loss),
                               np.concatenate(ref_loss), rtol=1e-5,
                               atol=1e-6)


def test_sharded_reconstruct_validates_batch_and_back_prop(eight_devices):
    gan = _tiny_gan()
    sharded = ShardedDefenseGAN(gan, make_mesh())
    x = np.zeros((12, 28, 28, 1), np.float32)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        sharded.reconstruct(x, jax.random.key(0))
    with pytest.raises(ValueError, match="serving path"):
        sharded.reconstruct(np.zeros((8, 28, 28, 1), np.float32),
                            jax.random.key(0), back_prop=True)


def test_sharded_cache_invalidated_on_weight_change(eight_devices):
    """shard_map bakes gan.state into the program as constants; after
    gan.load()/train() rebinds gan.state the wrapper must re-trace, not
    serve reconstructions from the stale weights."""
    import jax.numpy as jnp

    gan = _tiny_gan()
    sharded = ShardedDefenseGAN(gan, make_mesh())
    x = np.random.RandomState(1).rand(8, 28, 28, 1).astype(np.float32)
    key = jax.random.key(0)
    stale = np.asarray(sharded.reconstruct(x, key, kernel="xla").x_hat)

    # what load()/train() do: rebind state (and clear gan's own caches)
    gan.state = gan.state.replace(
        gen_params=jax.tree.map(lambda p: p + 0.5, gan.state.gen_params))
    gan._reconstructors.clear()

    fresh = np.asarray(sharded.reconstruct(x, key, kernel="xla").x_hat)
    ref = np.asarray(ShardedDefenseGAN(gan, make_mesh()).reconstruct(
        x, key, kernel="xla").x_hat)
    assert not np.allclose(fresh, stale)      # not the stale program
    np.testing.assert_allclose(fresh, ref, rtol=1e-5, atol=1e-6)


def test_sharded_cache_normalizes_override_spelling(eight_devices):
    """reconstruct() with default overrides and with explicit cfg-equal
    values must hit ONE cached program (Mosaic compiles cost minutes)."""
    gan = _tiny_gan()
    sharded = ShardedDefenseGAN(gan, make_mesh())
    x = np.zeros((8, 28, 28, 1), np.float32)
    sharded.reconstruct(x, jax.random.key(0), kernel="xla")
    sharded.reconstruct(x, jax.random.key(0), rec_rr=gan.cfg.rec_rr,
                        rec_iters=gan.cfg.rec_iters, rec_lr=gan.cfg.rec_lr,
                        kernel="xla")
    assert len(sharded._cache) == 1


def test_pipeline_over_sharded_gan(eight_devices):
    """DefendedPipeline composes with the sharded wrapper unchanged:
    calibrate + predict run multi-chip with per-example outputs intact."""
    import jax.numpy as jnp

    gan = _tiny_gan()
    mesh = make_mesh()
    sharded = ShardedDefenseGAN(gan, mesh)

    def logits_fn(xb):
        m = jnp.mean(xb, axis=(1, 2, 3))
        return jnp.stack([1.0 - m, m], -1)

    x_cal = np.asarray(gan.generate(jax.random.key(1), 16))
    x = np.asarray(gan.generate(jax.random.key(2), 16))
    pipe = DefendedPipeline(sharded, logits_fn, fpr=0.25)
    out = pipe.calibrate(x_cal, key=jax.random.key(3),
                         batch_size=16).predict(x, key=jax.random.key(4),
                                                batch_size=16)
    assert out.pred.shape == (16,) and out.flagged.shape == (16,)
    assert np.all(np.isfinite(out.rec_err))
    # on-manifold inputs under a matched-FPR calibration: not all flagged
    assert out.flagged.sum() < 16


def test_sharded_first_call_builds_kernel_outside_trace(eight_devices):
    """The FIRST sharded call with a cold reconstructor cache must not
    build the packed/Pallas program inside the shard_map trace: packers
    extract concrete weights via numerical probes + np.asarray, which is
    a TracerArrayConversionError under tracing (hit on the real chip,
    round-4 serving_ab_sharded; earlier CPU tests masked it because
    their single-chip exact-match control warmed the cache first)."""
    gan = _tiny_gan()
    mesh = make_mesh()
    sharded = ShardedDefenseGAN(gan, mesh)
    assert not gan._reconstructors  # cache genuinely cold
    x = np.random.RandomState(1).rand(
        mesh.devices.size, 28, 28, 1).astype(np.float32)
    # "packed" is the host-conversion-heaviest builder that runs on CPU
    res = sharded.reconstruct(x, jax.random.key(3), kernel="packed")
    assert np.asarray(res.x_hat).shape == x.shape
    # the warmed single-chip program must agree with per-shard replay
    r0 = gan.reconstruct(x[:1], jax.random.fold_in(jax.random.key(3), 0),
                         kernel="packed")
    np.testing.assert_allclose(np.asarray(res.x_hat[:1]),
                               np.asarray(r0.x_hat), rtol=1e-5, atol=1e-6)
