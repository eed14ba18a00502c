"""Amortized-inversion encoder (models/encoder.py, defense/encoder_init.py)
and encoder-initialized projection (DefenseGAN rec_init=encoder*).

No reference equivalent (kabkabm/defensegan has no encoder) — these tests
are the spec: z0 policies, training convergence against a frozen
generator, exact rec_init semantics (the projection is identical under
every init; only z0 changes), checkpoint round-trip, and the
better-start property that justifies the feature.
"""

import os
import shutil
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.defense.encoder_init import (encoder_z0,  # noqa: E402
                                                 train_encoder)
from defensegan_tpu.defense.project import reconstruct  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models import encoder_for  # noqa: E402
from defensegan_tpu.models.generator import from_image_space  # noqa: E402


def _tiny_gan(tmpdir, **kw):
    # float32: the exactness tests compare a jitted program against the
    # eager op-by-op path, which differ at bf16 rounding level otherwise
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5, encoder_train_iters=60,
                 encoder_batch=32, compute_dtype="float32",
                 output_dir=tmpdir, **kw)
    return DefenseGAN(cfg)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="enc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_encoder_shapes_per_dataset():
    for ds, hw, ch in (("mnist", 28, 1), ("f-mnist", 28, 1),
                       ("celeba", 64, 3)):
        enc = encoder_for(ds, dim=4, z_dim=8)
        x = jnp.zeros((3, hw, hw, ch), jnp.float32)
        params = enc.init(jax.random.key(0), x)["params"]
        z = enc.apply({"params": params}, x)
        assert z.shape == (3, 8) and z.dtype == jnp.float32
    with pytest.raises(ValueError):
        encoder_for("nope")


def test_encoder_z0_policies():
    enc = encoder_for("mnist", dim=4, z_dim=8)
    x = jax.random.uniform(jax.random.key(1), (5, 28, 28, 1))
    params = enc.init(jax.random.key(0), x)["params"]

    def enc_apply(xt):
        return enc.apply({"params": params}, xt)

    z_enc = enc_apply(from_image_space(x))
    for mode in ("encoder", "encoder_jitter"):
        z0 = encoder_z0(enc_apply, x, jax.random.key(2), rec_rr=4,
                        mode=mode, sigma=0.25)
        assert z0.shape == (5, 4, 8)
        # restart 0 is E(x) exactly, both modes
        np.testing.assert_allclose(np.asarray(z0[:, 0]), np.asarray(z_enc),
                                   rtol=1e-6)
    # jitter restarts stay sigma-close to E(x); hybrid restarts are
    # unconditioned N(0, I) draws (typically far from E(x))
    zj = encoder_z0(enc_apply, x, jax.random.key(2), rec_rr=4,
                    mode="encoder_jitter", sigma=0.01)
    dev = np.abs(np.asarray(zj[:, 1:]) - np.asarray(z_enc)[:, None])
    assert dev.max() < 0.1
    zh = encoder_z0(enc_apply, x, jax.random.key(2), rec_rr=4,
                    mode="encoder", sigma=0.01)
    # hybrid's random restarts ignore sigma and are not near-copies of E(x)
    dev_h = np.abs(np.asarray(zh[:, 1:]) - np.asarray(z_enc)[:, None])
    assert dev_h.max() > 0.5
    # R=1: just the encoder point
    z1 = encoder_z0(enc_apply, x, jax.random.key(2), rec_rr=1,
                    mode="encoder")
    assert z1.shape == (5, 1, 8)
    with pytest.raises(ValueError):
        encoder_z0(enc_apply, x, jax.random.key(2), rec_rr=2, mode="random")


def test_train_encoder_learns_inverse(tmpdir):
    """Training drives both loss terms down and E becomes a useful
    amortized inverse: G(E(x)) reconstructs on-manifold images far
    better than an untrained encoder does."""
    gan = _tiny_gan(tmpdir)
    # "data" = generator samples (the manifold itself: the cleanest test
    # of inversion, no GAN training needed)
    x = np.asarray(gan.generate(jax.random.key(0), 256))
    enc = encoder_for("mnist", dim=4, z_dim=8)
    params0, m0 = train_encoder(enc, gan.gen_apply_tanh, x,
                                jax.random.key(1), iters=1, quiet=True)
    params1, m1 = train_encoder(enc, gan.gen_apply_tanh, x,
                                jax.random.key(1), iters=150, quiet=True)
    assert m1["img_mse"] < m0["img_mse"] * 0.9
    assert m1["z_cycle"] < m0["z_cycle"] * 0.9

    def rec_mse(params):
        xt = from_image_space(jnp.asarray(x[:32]))
        z = enc.apply({"params": params}, xt)
        g = gan.gen_apply_tanh(z)
        return float(jnp.mean(jnp.square(g - xt)))

    assert rec_mse(params1) < rec_mse(params0) * 0.9


def test_reconstruct_encoder_init_semantics(tmpdir):
    """rec_init only changes z0: reconstruct(init='encoder') equals a
    manual defense.reconstruct call with the same z0 exactly, and with
    L=0, R=1 the result IS G(E(x))."""
    gan = _tiny_gan(tmpdir)
    x = np.asarray(gan.generate(jax.random.key(0), 8))
    gan.train_encoder(x, iters=30, quiet=True)

    key = jax.random.key(3)
    res = gan.reconstruct(jnp.asarray(x), key, init="encoder")
    z0 = gan._encoder_z0(jnp.asarray(x), key, gan.cfg.rec_rr, "encoder")
    manual = reconstruct(gan.gen_apply_tanh, jnp.asarray(x), z0,
                         rec_iters=gan.cfg.rec_iters,
                         rec_lr=gan.cfg.rec_lr,
                         momentum=gan.cfg.rec_momentum)
    np.testing.assert_allclose(np.asarray(res.x_hat),
                               np.asarray(manual.x_hat), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.loss),
                               np.asarray(manual.loss), atol=1e-6)

    # L=0, R=1: pure amortized reconstruction G(E(x))
    res0 = gan.reconstruct(jnp.asarray(x), key, rec_rr=1, rec_iters=0,
                           init="encoder")
    from defensegan_tpu.models.generator import to_image_space
    direct = to_image_space(gan.gen_apply_tanh(gan.encode(jnp.asarray(x))))
    np.testing.assert_allclose(np.asarray(res0.x_hat), np.asarray(direct),
                               atol=1e-5)

    # restart 0 init == E(x) for both encoder modes through the public API
    res_j = gan.reconstruct(jnp.asarray(x), key, init="encoder_jitter")
    assert res_j.x_hat.shape == res.x_hat.shape


def test_encoder_init_is_a_better_start(tmpdir):
    """The feature's reason to exist: at small L, encoder init reaches a
    lower projection loss than random init (on-manifold inputs)."""
    gan = _tiny_gan(tmpdir)
    x = np.asarray(gan.generate(jax.random.key(0), 64))
    gan.train_encoder(x, iters=200, quiet=True)
    key = jax.random.key(4)
    xs = jnp.asarray(x[:16])
    loss_rand = float(np.mean(np.asarray(
        gan.reconstruct(xs, key, rec_rr=2, rec_iters=3).loss)))
    loss_enc = float(np.mean(np.asarray(
        gan.reconstruct(xs, key, rec_rr=2, rec_iters=3,
                        init="encoder").loss)))
    assert loss_enc < loss_rand


def test_encoder_checkpoint_roundtrip(tmpdir):
    gan = _tiny_gan(tmpdir)
    x = np.asarray(gan.generate(jax.random.key(0), 16))
    gan.train_encoder(x, iters=10, quiet=True)
    z_before = np.asarray(gan.encode(jnp.asarray(x)))

    gan2 = _tiny_gan(tmpdir)
    assert gan2.has_encoder()
    gan2.load_encoder()
    z_after = np.asarray(gan2.encode(jnp.asarray(x)))
    np.testing.assert_allclose(z_before, z_after, rtol=1e-6)


def test_encoder_init_requires_trained_encoder(tmpdir):
    gan = _tiny_gan(tmpdir)
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    assert not gan.has_encoder()
    with pytest.raises(RuntimeError, match="train_encoder"):
        gan.reconstruct(x, jax.random.key(0), init="encoder")
    with pytest.raises(ValueError, match="rec_init"):
        gan.reconstruct(x, jax.random.key(0), init="bogus")


def test_cfg_rec_init_default_and_pipeline(tmpdir):
    """cfg.rec_init=encoder routes every consumer (model_eval_gan /
    DefendedPipeline) through the encoder init without per-call args."""
    from defensegan_tpu.defense import DefendedPipeline

    gan = _tiny_gan(tmpdir, rec_init="encoder_jitter", encoder_sigma=0.3)
    x = np.asarray(gan.generate(jax.random.key(0), 16))
    gan.train_encoder(x, iters=20, quiet=True)

    def logits_fn(xb):
        m = jnp.mean(xb, axis=(1, 2, 3))
        return jnp.stack([1.0 - m, m], -1)

    pipe = DefendedPipeline(gan, logits_fn, fpr=0.25).calibrate(
        x[:8], key=jax.random.key(1), batch_size=8)
    out = pipe.predict(x[8:], key=jax.random.key(2), batch_size=8)
    assert out.pred.shape == (8,)
    assert np.isfinite(out.rec_err).all()

    # explicit rec_init override through the pipeline
    pipe2 = DefendedPipeline(gan, logits_fn, fpr=0.25,
                             rec_init="random").calibrate(
        x[:8], key=jax.random.key(1), batch_size=8)
    out2 = pipe2.predict(x[8:], key=jax.random.key(2), batch_size=8)
    assert out2.pred.shape == (8,)
