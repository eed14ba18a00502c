"""Pallas v3 fused s2d projection kernel (interpret mode on CPU):
must track the XLA reconstruct path step-for-step on the two-deconv deep
arch — same restart argmins, losses equal to bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import Config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v3 import (
    make_pallas_s2d_reconstructor, s2d_kernel_available)


def _deep_gan(tmp_path):
    cfg = Config(type="mnist", gen_arch="deep", gen_dim=4, disc_dim=4,
                 latent_dim=32, rec_rr=2, rec_iters=8,
                 compute_dtype="bfloat16", projection_kernel="xla",
                 output_dir=str(tmp_path / "run"))
    return DefenseGAN(cfg)


def test_s2d_kernel_availability(tmp_path):
    assert s2d_kernel_available(_deep_gan(tmp_path))
    cfg = Config(type="mnist", gen_arch="wide", gen_dim=4, disc_dim=4,
                 latent_dim=32, output_dir=str(tmp_path / "wide"))
    assert not s2d_kernel_available(DefenseGAN(cfg))
    cfg = Config(type="celeba", gen_arch="deep", gen_dim=4, disc_dim=4,
                 latent_dim=32, output_dir=str(tmp_path / "celeba"))
    assert not s2d_kernel_available(DefenseGAN(cfg))


def test_v3_kernel_matches_xla_path(tmp_path):
    gan = _deep_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(3)

    ref = gan.reconstruct(x, key)  # XLA scan path

    run = make_pallas_s2d_reconstructor(
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


def test_v3_kernel_honors_z0_override(tmp_path):
    """Same contract as v2/v2i's z0 override (digits' encoder-init cells
    run THIS kernel with an injected z0): injected z0 tracks the XLA
    reconstruct under that z0; the keyed run differs."""
    from defensegan_tpu.defense.project import reconstruct, sample_z0

    gan = _deep_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(9)
    z0 = sample_z0(jax.random.key(10), 4, gan.cfg.rec_rr,
                   gan.cfg.latent_dim)

    run = make_pallas_s2d_reconstructor(
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
                               rtol=0.1, atol=8e-3)
    got_keyed = run(x, key)
    assert not np.allclose(np.asarray(got_keyed.all_losses),
                           np.asarray(got.all_losses))
