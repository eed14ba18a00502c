"""v4 fused 64x64 projection (scripts/fused_projection_v4_exp.py):
interpret-mode numerics at tiny dims — the kernel's momentum-GD loop
through the full multi-level grid-conv chain (fc -> mid levels with
interleaves -> folded out level) must reproduce the f32 XLA projection.
The on-chip A/B + quality gate is queue work (round4 queue)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

import defensegan_tpu.kernels.fused_projection_v4 as v4  # noqa: E402

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.gan.defense_gan import resolve_projection_kernel  # noqa: E402


def test_pallas_v4_resolution_is_opt_in():
    cfg = Config(type="celeba", gen_dim=4, latent_dim=16, image_size=64,
                 channels=3)
    gan = DefenseGAN(cfg)
    # opt-in: runnable shapes resolve to v4 on TPU...
    assert resolve_projection_kernel(gan, n=64, requested="pallas_v4",
                                     on_tpu=True) == "pallas_v4"
    # ... but auto NEVER resolves to v4 (not gated on-chip yet): 64x64
    # multi-deconv degrades through the pallas guards to best-XLA
    assert resolve_projection_kernel(gan, n=64, requested="auto",
                                     on_tpu=True) == "xla"
    # guard failures degrade: off-TPU, attack graphs, non-tile batch
    assert resolve_projection_kernel(gan, n=64, requested="pallas_v4",
                                     on_tpu=False) == "xla"
    assert resolve_projection_kernel(gan, n=64, requested="pallas_v4",
                                     on_tpu=True, back_prop=True) == "xla"
    assert resolve_projection_kernel(gan, n=33, requested="pallas_v4",
                                     on_tpu=True) == "xla"
    # the single-deconv wide MNIST arch is out of v4's domain
    wide = DefenseGAN(Config(type="mnist", gen_dim=4, latent_dim=8,
                             gen_arch="wide"))
    assert resolve_projection_kernel(wide, n=64, requested="pallas_v4",
                                     on_tpu=True) == "packed"
    # exp script re-exports the package implementation (single copy)
    import fused_projection_v4_exp as exp
    assert exp.make_v4_reconstructor is v4.make_v4_reconstructor


def _gan(arch, **kw):
    cfg = Config(type="celeba", gen_dim=4, latent_dim=16, rec_rr=3,
                 rec_iters=5, image_size=64, channels=3, gen_arch=arch,
                 **kw)
    return DefenseGAN(cfg)


@pytest.mark.parametrize("arch,n_levels", [("deep", 4), ("wide", 3)])
def test_v4_reconstructor_matches_xla(arch, n_levels):
    gan = _gan(arch)
    cfg = gan.cfg
    assert len(v4.V4Pack(gan).levels) == n_levels
    run = v4.make_v4_reconstructor(gan, rec_rr=3, rec_iters=5,
                                   rec_lr=cfg.rec_lr,
                                   momentum=cfg.rec_momentum, tile=2,
                                   interpret=True)
    x = jax.random.uniform(jax.random.key(1), (4,) + cfg.image_shape)
    key = jax.random.key(7)
    got = run(x, key)
    ref = gan.reconstruct(x, key, kernel="xla")
    gl, rl = np.asarray(got.all_losses), np.asarray(ref.all_losses)
    assert got.x_hat.shape == x.shape
    assert np.isfinite(np.asarray(got.x_hat)).all()
    # same z0 (same key/sampler); bf16 trajectories track f32 closely at
    # this depth — losses and selection must agree
    assert np.abs(gl - rl).max() / rl.max() < 0.05
    assert (gl.argmin(1) == rl.argmin(1)).all()


def test_v4_generalizes_to_mnist_deep_topology():
    """Two-deconv MNIST deep: the first mid level is also the last
    (no interleave anywhere) — the v3 kernel's domain, exercised here as
    the v4 edge case."""
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, rec_rr=2,
                 rec_iters=4)
    gan = DefenseGAN(cfg)
    pack = v4.V4Pack(gan)
    assert [lv["interleave_after"] for lv in pack.levels] == [None, None]
    run = v4.make_v4_reconstructor(gan, rec_rr=2, rec_iters=4,
                                   rec_lr=cfg.rec_lr,
                                   momentum=cfg.rec_momentum, tile=2,
                                   interpret=True)
    x = jax.random.uniform(jax.random.key(2), (2,) + cfg.image_shape)
    got = run(x, jax.random.key(3))
    ref = gan.reconstruct(x, jax.random.key(3), kernel="xla")
    gl, rl = np.asarray(got.all_losses), np.asarray(ref.all_losses)
    assert np.abs(gl - rl).max() / rl.max() < 0.05


def test_v4_rejects_single_deconv_wide_mnist():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, gen_arch="wide")
    gan = DefenseGAN(cfg)
    with pytest.raises(ValueError, match="single-deconv"):
        v4.V4Pack(gan)


def test_v4_one_step_gradient_matches_f32_reference():
    """One momentum-GD step of the kernel == lr * grad of the packed-apply
    MSE (the probe-level check, through the WHOLE stack)."""
    from defensegan_tpu.defense.fastgen import (make_packed_apply,
                                                pack_generator)
    from defensegan_tpu.defense.project import sample_z0
    from defensegan_tpu.models.generator import from_image_space

    gan = _gan("deep")
    pack = v4.V4Pack(gan)
    tile, n = 2, 4
    x = jax.random.uniform(jax.random.key(1), (n,) + gan.cfg.image_shape)
    x_tanh = from_image_space(x)
    z0 = sample_z0(jax.random.key(0), 2, 2, pack.z_dim).reshape(
        n, pack.z_dim)
    z1 = v4.fused_projection_v4(pack, pack.x_rows(x_tanh, tile), z0,
                                rec_iters=1, rec_lr=0.05, momentum=0.7,
                                tile=tile, interpret=True)
    packed = pack_generator(gan.generator, gan.state.gen_params,
                            gan.state.gen_stats, "conv")
    af = make_packed_apply(packed)
    xf = x_tanh.reshape(n, -1)
    g = jax.grad(lambda z: jnp.mean(jnp.square(af(z) - xf),
                                    axis=1).sum())(z0)
    d_got = np.asarray(z1 - z0)
    d_ref = np.asarray(-0.05 * g)
    rel = np.abs(d_got - d_ref).max() / (np.abs(d_ref).max() + 1e-30)
    assert rel < 3e-2, rel
