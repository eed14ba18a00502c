"""BPDA attack mode (attacks/compose.py grad_mode="bpda"; Athalye,
Carlini & Wagner 2018, arXiv:1802.00420 — not in the reference repo).

Semantics under test: forward pass = the REAL projection defense;
backward pass = identity around it (straight-through), so the gradient
w.r.t. x equals the classifier's gradient evaluated at the purified
point G(z*)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.attacks import make_attack_target  # noqa: E402
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.defense import reconstruct, sample_z0  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402


def _setup():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=4, num_classes=10)
    gan = DefenseGAN(cfg)

    def logits_fn(x):
        # nonlinear in x so grad depends on WHERE it is evaluated
        v = jnp.mean(jnp.square(x), axis=(1, 2, 3))
        return jnp.stack([v, -v] + [0 * v] * 8, axis=-1)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 1),
                    jnp.float32)
    key = jax.random.key(11)
    return cfg, gan, logits_fn, x, key


def test_bpda_forward_matches_real_defense():
    cfg, gan, logits_fn, x, key = _setup()
    tgt = make_attack_target(gan, logits_fn, cfg, grad_mode="bpda")

    def gen_apply(z):
        return gan.generator.apply(
            {"params": gan.state.gen_params,
             "batch_stats": gan.state.gen_stats}, z, train=False)

    z0 = sample_z0(key, x.shape[0], cfg.rec_rr, cfg.latent_dim)
    res = reconstruct(gen_apply, x, z0, rec_iters=cfg.rec_iters,
                      rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum)
    np.testing.assert_allclose(np.asarray(tgt(x, key)),
                               np.asarray(logits_fn(res.x_hat)),
                               rtol=1e-5, atol=1e-6)


def test_bpda_gradient_is_classifier_grad_at_purified_point():
    cfg, gan, logits_fn, x, key = _setup()
    tgt_bpda = make_attack_target(gan, logits_fn, cfg, grad_mode="bpda")
    tgt_exact = make_attack_target(gan, logits_fn, cfg, grad_mode="exact")

    g_bpda = jax.grad(lambda x: tgt_bpda(x, key)[:, 0].sum())(x)

    # straight-through: same as grad of the classifier alone, evaluated
    # at the purified images
    def gen_apply(z):
        return gan.generator.apply(
            {"params": gan.state.gen_params,
             "batch_stats": gan.state.gen_stats}, z, train=False)

    z0 = sample_z0(key, x.shape[0], cfg.rec_rr, cfg.latent_dim)
    x_hat = reconstruct(gen_apply, x, z0, rec_iters=cfg.rec_iters,
                        rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum).x_hat
    g_ref = jax.grad(lambda u: logits_fn(u)[:, 0].sum())(x_hat)
    np.testing.assert_allclose(np.asarray(g_bpda), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)

    # and it is NOT the exact unrolled gradient (the whole point)
    g_exact = jax.grad(lambda x: tgt_exact(x, key)[:, 0].sum())(x)
    assert not np.allclose(np.asarray(g_bpda), np.asarray(g_exact),
                           rtol=1e-2, atol=1e-4)


def test_bpda_rejects_unknown_mode_and_bad_cli_combo():
    cfg, gan, logits_fn, _, _ = _setup()
    with pytest.raises(ValueError):
        make_attack_target(gan, logits_fn, cfg, grad_mode="identity")

    from defensegan_tpu.cli import whitebox
    with pytest.raises(SystemExit) as ex:
        whitebox.main(["--attack_type", "fgsm", "--defense_type", "none",
                       "--attack_grad", "bpda"])
    assert ex.value.code == 2
