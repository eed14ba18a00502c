"""uint8 serving ingest: images enter the defense as uint8 [0, 255] and
are normalized ON DEVICE (models/generator.py::from_image_space) — 4x
less host->device traffic, which the measured serving curve showed is
the end-to-end bottleneck at the fast operating points (RESULTS.md
round 5b). Contract: uint8 input == float32(x/255) input, exactly, on
every projection path."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models.generator import from_image_space  # noqa: E402


def _u8(rng, n=4):
    return rng.randint(0, 256, size=(n, 28, 28, 1)).astype(np.uint8)


def test_from_image_space_uint8():
    x8 = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    a = np.asarray(from_image_space(jnp.asarray(x8)))
    b = np.asarray(from_image_space(jnp.asarray(x8, jnp.float32) / 255.0))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.min() == -1.0 and a.max() == 1.0


def test_reconstruct_uint8_matches_f32(rng):
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5, compute_dtype="float32",
                 output_dir="/tmp/u8_test_run")
    gan = DefenseGAN(cfg)
    x8 = _u8(rng)
    xf = x8.astype(np.float32) / 255.0
    key = jax.random.key(2)
    for kernel in ("xla", "packed"):
        r8 = gan.reconstruct(jnp.asarray(x8), key, kernel=kernel)
        rf = gan.reconstruct(jnp.asarray(xf), key, kernel=kernel)
        np.testing.assert_allclose(np.asarray(r8.x_hat),
                                   np.asarray(rf.x_hat), atol=1e-5,
                                   err_msg=f"kernel={kernel}")
        np.testing.assert_allclose(np.asarray(r8.loss),
                                   np.asarray(rf.loss), atol=1e-6,
                                   err_msg=f"kernel={kernel}")


def test_pallas_wrapper_uint8_matches_f32(rng):
    from defensegan_tpu.kernels.fused_projection_v2 import \
        make_pallas_dense_reconstructor

    cfg = Config(type="mnist", gen_arch="wide", gen_dim=4, latent_dim=32,
                 disc_dim=4, rec_rr=2, rec_iters=4,
                 output_dir="/tmp/u8_test_wide")
    gan = DefenseGAN(cfg)
    run = make_pallas_dense_reconstructor(
        gan, rec_rr=2, rec_iters=4, rec_lr=cfg.rec_lr,
        momentum=cfg.rec_momentum, tile=8, interpret=True)
    x8 = _u8(rng)
    key = jax.random.key(3)
    r8 = run(jnp.asarray(x8), key)
    rf = run(jnp.asarray(x8, jnp.float32) / 255.0, key)
    np.testing.assert_allclose(np.asarray(r8.x_hat), np.asarray(rf.x_hat),
                               atol=1e-4)


def test_pipeline_predict_uint8(rng):
    from defensegan_tpu.defense import DefendedPipeline

    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5, compute_dtype="float32",
                 output_dir="/tmp/u8_test_pipe")
    gan = DefenseGAN(cfg)

    def logits_fn(xb):
        m = jnp.mean(xb, axis=(1, 2, 3))
        return jnp.stack([1.0 - m, m], -1)

    x8 = _u8(rng, 8)
    xf = x8.astype(np.float32) / 255.0
    pipe = DefendedPipeline(gan, logits_fn, fpr=0.25).calibrate(
        xf, key=jax.random.key(4), batch_size=8)
    o8 = pipe.predict(x8, key=jax.random.key(5), batch_size=8)
    of = pipe.predict(xf, key=jax.random.key(5), batch_size=8)
    np.testing.assert_array_equal(o8.pred, of.pred)
    np.testing.assert_allclose(o8.rec_err, of.rec_err, atol=1e-6)
    np.testing.assert_array_equal(o8.flagged, of.flagged)
