"""DefenseGAN.reconstruct kernel dispatch: the packed (BN-folded flat)
path must agree with the xla (flax) path — identical restart selection,
matching losses — and the auto default must resolve per architecture."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import Config
from defensegan_tpu.data.synthetic import make_synthetic
from defensegan_tpu.gan import DefenseGAN


def _gan(tmp_path, arch, kernel="auto"):
    cfg = Config(type="mnist", gen_arch=arch, gen_dim=4, disc_dim=4,
                 latent_dim=16, rec_rr=3, rec_iters=10,
                 compute_dtype="float32", projection_kernel=kernel,
                 output_dir=str(tmp_path / f"run-{arch}-{kernel}"))
    return DefenseGAN(cfg)


def test_packed_matches_xla_reconstruct(tmp_path):
    x = jnp.asarray(make_synthetic(6, 28, 1, seed=0)[0])
    key = jax.random.key(1)
    for arch in ("wide", "deep"):
        gan_x = _gan(tmp_path, arch, "xla")
        gan_p = _gan(tmp_path, arch, "packed")
        # identical weights: same seed init
        ref = gan_x.reconstruct(x, key)
        got = gan_p.reconstruct(x, key)
        variant = "conv" if arch == "wide" else "s2d"  # auto resolution
        assert ("packed", variant, 3, 10, gan_p.cfg.rec_lr, False) \
            in gan_p._reconstructors
        np.testing.assert_array_equal(
            np.asarray(ref.all_losses).argmin(1),
            np.asarray(got.all_losses).argmin(1))
        np.testing.assert_allclose(np.asarray(got.all_losses),
                                   np.asarray(ref.all_losses),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.x_hat),
                                   np.asarray(ref.x_hat),
                                   rtol=1e-3, atol=1e-4)


def test_auto_resolution(tmp_path):
    x = jnp.asarray(make_synthetic(4, 28, 1, seed=2)[0])
    key = jax.random.key(0)
    wide = _gan(tmp_path, "wide", "auto")
    wide.reconstruct(x, key)
    assert any(sig[0] == "packed" for sig in wide._reconstructors)
    deep = _gan(tmp_path, "deep", "auto")
    deep.reconstruct(x, key)
    # deep auto -> xla: cache key is the plain (rr, iters, lr, bp) tuple
    assert all(sig[0] != "packed" for sig in deep._reconstructors)


def test_packed_cache_invalidated_on_train(tmp_path):
    gan = _gan(tmp_path, "wide", "packed")
    x = jnp.asarray(make_synthetic(4, 28, 1, seed=3)[0])
    gan.reconstruct(x, jax.random.key(0))
    assert len(gan._reconstructors) == 1
    images, _ = make_synthetic(32, 28, 1, seed=4)
    gan.cfg.batch_size = 8
    gan.cfg.disc_iters = 1
    gan.cfg.sample_every = 10**9
    gan.cfg.save_every = 10**9
    gan.train(images, train_iters=2, log_every=1, quiet=True,
              on_divergence="raise")
    assert len(gan._reconstructors) == 0  # packed weights were stale

    # post-train reconstruct rebuilds from the NEW weights
    res = gan.reconstruct(x, jax.random.key(0))
    assert np.isfinite(np.asarray(res.loss)).all()


def test_packed_back_prop_gradients(tmp_path):
    """White-box attacks differentiate through reconstruct(back_prop=True);
    the packed path must produce finite, nonzero input gradients."""
    gan = _gan(tmp_path, "wide", "packed")
    x = jnp.asarray(make_synthetic(2, 28, 1, seed=5)[0])

    def loss(xx):
        res = gan.reconstruct(xx, jax.random.key(1), back_prop=True)
        return jnp.sum(res.x_hat)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
