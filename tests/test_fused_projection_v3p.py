"""Pallas v3p (padded-x, mask-elided) fused s2d projection kernel
(interpret mode on CPU): the pad column must be numerically invisible —
same restart argmins and losses as the XLA reconstruct path, and
step-for-step equal to the v3 kernel it re-layouts."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import Config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v3 import (
    make_pallas_s2d_reconstructor)
from defensegan_tpu.kernels.fused_projection_v3p import (
    make_pallas_s2d_padded_reconstructor)


def _deep_gan(tmp_path):
    cfg = Config(type="mnist", gen_arch="deep", gen_dim=4, disc_dim=4,
                 latent_dim=32, rec_rr=2, rec_iters=8,
                 compute_dtype="bfloat16", projection_kernel="xla",
                 output_dir=str(tmp_path / "run"))
    return DefenseGAN(cfg)


def test_v3p_kernel_matches_xla_and_v3(tmp_path):
    gan = _deep_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(3)

    ref = gan.reconstruct(x, key)  # XLA scan path
    kw = dict(rec_rr=gan.cfg.rec_rr, rec_iters=gan.cfg.rec_iters,
              rec_lr=gan.cfg.rec_lr, momentum=gan.cfg.rec_momentum,
              tile=8, interpret=True)
    got = make_pallas_s2d_padded_reconstructor(gan, **kw)(x, key)
    v3 = make_pallas_s2d_reconstructor(gan, **kw)(x, key)

    # identical restart selection vs the XLA reference
    np.testing.assert_array_equal(
        np.asarray(ref.all_losses).argmin(1),
        np.asarray(got.all_losses).argmin(1))
    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(ref.all_losses),
                               rtol=0.08, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.x_hat),
                               np.asarray(ref.x_hat), atol=0.05)
    # v3p is a pure re-layout of v3: same math, same bf16 rounding points
    # except the mask multiplies — losses must agree tightly
    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(v3.all_losses),
                               rtol=0.02, atol=1e-3)
