"""Pallas v2i int8 fused projection kernel (interpret mode on CPU):
the int8-MXU variant quantizes only the in-loop D matmuls (per-row
activation / per-column weight symmetric int8), so it must stay in the
same optimization basin as the XLA/bf16 paths — near-equal losses and
reconstructions, and (at these well-separated test scales) the same
restart argmins."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.configs import Config
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.kernels.fused_projection_v2i import (
    make_pallas_dense_int8_reconstructor, pack_dense_int8)


def _wide_gan(tmp_path):
    cfg = Config(type="mnist", gen_arch="wide", gen_dim=4, disc_dim=4,
                 latent_dim=32, rec_rr=2, rec_iters=8,
                 compute_dtype="bfloat16",
                 output_dir=str(tmp_path / "run"))
    return DefenseGAN(cfg)


def test_int8_pack_roundtrip(tmp_path):
    pack = pack_dense_int8(_wide_gan(tmp_path))
    d = np.asarray(pack.base.d, np.float32)
    deq = np.asarray(pack.dq, np.float32) * np.asarray(pack.sd)
    # per-column symmetric int8: worst-case error = scale/2 per entry
    err = np.abs(deq - d)
    bound = np.asarray(pack.sd)[0] * 0.5 + 1e-7
    assert (err <= bound[None, :]).all()
    # zero-padded columns quantize to exactly zero
    out_dim = pack.base.out_dim
    assert np.all(np.asarray(pack.dq)[:, out_dim:] == 0)


def test_v2i_kernel_tracks_xla_path(tmp_path):
    gan = _wide_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(3)

    ref = gan.reconstruct(x, key)  # XLA scan path

    run = make_pallas_dense_int8_reconstructor(
        gan, rec_rr=gan.cfg.rec_rr, rec_iters=gan.cfg.rec_iters,
        rec_lr=gan.cfg.rec_lr, momentum=gan.cfg.rec_momentum,
        tile=8, interpret=True)
    got = run(x, key)

    np.testing.assert_array_equal(
        np.asarray(ref.all_losses).argmin(1),
        np.asarray(got.all_losses).argmin(1))
    # int8 in-loop arithmetic: same basin, slightly looser than bf16
    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(ref.all_losses),
                               rtol=0.15, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.x_hat),
                               np.asarray(ref.x_hat), atol=0.08)


def test_v2i_tie_aware_gate(tmp_path):
    """The int8 quality gate metric (VERDICT round-2 item 6): material
    disagreement (restart picks worse than the reference's by more than
    bf16 noise) must be ~zero even when raw argmins occasionally differ."""
    from defensegan_tpu.eval import tie_aware_disagreement

    gan = _wide_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(1).rand(16, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(5)
    ref = gan.reconstruct(x, key)  # XLA scan path
    run = make_pallas_dense_int8_reconstructor(
        gan, rec_rr=gan.cfg.rec_rr, rec_iters=gan.cfg.rec_iters,
        rec_lr=gan.cfg.rec_lr, momentum=gan.cfg.rec_momentum,
        tile=8, interpret=True)
    got = run(x, key)
    m = tie_aware_disagreement(np.asarray(ref.all_losses),
                               np.asarray(got.all_losses), tau=1e-2)
    assert m["material_disagreement"] == 0.0
    assert m["mean_regret"] < 1e-2
    # metric sanity: a deliberately bad picker IS charged, a tie is not
    ref_l = np.array([[0.0, 1.0], [0.0, 1e-4]])
    bad_l = np.array([[1.0, 0.0], [1e-4, 0.0]])  # row0: worse by 1.0;
    # row1: "disagrees" but within the tie threshold
    m_bad = tie_aware_disagreement(ref_l, bad_l, tau=1e-2)
    assert m_bad["raw_disagreement"] == 1.0
    assert m_bad["material_disagreement"] == 0.5


def test_v2i_kernel_honors_z0_override(tmp_path):
    """Same contract as v2's z0 override (the encoder-init serving path
    runs THIS kernel with an injected z0): injected z0 tracks the XLA
    reconstruct under that z0; the keyed run differs."""
    from defensegan_tpu.defense.project import reconstruct, sample_z0

    gan = _wide_gan(tmp_path)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 28, 28, 1)
                    .astype(np.float32))
    key = jax.random.key(9)
    z0 = sample_z0(jax.random.key(10), 4, gan.cfg.rec_rr,
                   gan.cfg.latent_dim)

    run = make_pallas_dense_int8_reconstructor(
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
