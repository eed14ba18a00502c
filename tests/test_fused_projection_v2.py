"""Pallas v2 fused dense projection kernel (interpret mode on CPU):
must track the XLA reconstruct path step-for-step on the wide arch —
same restart argmins, losses equal to bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import Config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v2 import (
    dense_kernel_available, make_pallas_dense_reconstructor)


def _wide_gan(tmp_path):
    cfg = Config(type="mnist", gen_arch="wide", gen_dim=4, disc_dim=4,
                 latent_dim=32, rec_rr=2, rec_iters=8,
                 compute_dtype="bfloat16",
                 output_dir=str(tmp_path / "run"))
    return DefenseGAN(cfg)


def test_dense_kernel_availability(tmp_path):
    assert dense_kernel_available(_wide_gan(tmp_path))
    cfg = Config(type="mnist", gen_arch="deep", gen_dim=4, disc_dim=4,
                 latent_dim=32, output_dir=str(tmp_path / "deep"))
    assert not dense_kernel_available(DefenseGAN(cfg))


def test_v2_kernel_matches_xla_path(tmp_path):
    gan = _wide_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(3)

    ref = gan.reconstruct(x, key)  # XLA scan path

    run = make_pallas_dense_reconstructor(
        gan, rec_rr=gan.cfg.rec_rr, rec_iters=gan.cfg.rec_iters,
        rec_lr=gan.cfg.rec_lr, momentum=gan.cfg.rec_momentum,
        tile=8, interpret=True)
    got = run(x, key)

    # identical restart selection everywhere
    np.testing.assert_array_equal(
        np.asarray(ref.all_losses).argmin(1),
        np.asarray(got.all_losses).argmin(1))
    # losses agree to bf16-accumulation tolerance
    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(ref.all_losses),
                               rtol=0.08, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.x_hat),
                               np.asarray(ref.x_hat), atol=0.05)
    assert got.x_hat.shape == ref.x_hat.shape
    assert got.z_star.shape == ref.z_star.shape


def test_v2_kernel_honors_z0_override(tmp_path):
    """The z0 runtime input (encoder-init path, defense/encoder_init.py):
    same z0 -> same result as the XLA path with that z0; different z0 ->
    different trajectories. No Mosaic recompile is involved (z0 is a
    plain pallas_call input)."""
    from defensegan_tpu.defense.project import reconstruct, sample_z0

    gan = _wide_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(7)
    z0 = sample_z0(jax.random.key(8), 4, gan.cfg.rec_rr, gan.cfg.latent_dim)

    run = make_pallas_dense_reconstructor(
        gan, rec_rr=gan.cfg.rec_rr, rec_iters=gan.cfg.rec_iters,
        rec_lr=gan.cfg.rec_lr, momentum=gan.cfg.rec_momentum,
        tile=8, interpret=True)
    got = run(x, key, z0)
    ref = reconstruct(gan.gen_apply_tanh, x, z0,
                      rec_iters=gan.cfg.rec_iters, rec_lr=gan.cfg.rec_lr,
                      momentum=gan.cfg.rec_momentum)
    np.testing.assert_array_equal(
        np.asarray(ref.all_losses).argmin(1),
        np.asarray(got.all_losses).argmin(1))
    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(ref.all_losses),
                               rtol=0.08, atol=5e-3)
    # the key-sampled run (z0=None) differs from the injected-z0 run
    got_keyed = run(x, key)
    assert not np.allclose(np.asarray(got_keyed.all_losses),
                           np.asarray(got.all_losses))
