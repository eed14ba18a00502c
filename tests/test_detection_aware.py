"""Detection-aware adaptive attack (attacks/compose.py::make_attack_loss
+ the PGD loss_fn hook): the attacker's objective is
xent - rec_penalty * rec_loss, where rec_loss is the EXACT statistic the
rec-error detector thresholds (tanh-space best-restart projection MSE)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.attacks import (make_attack_loss,  # noqa: E402
                                    make_attack_target, pgd)
from defensegan_tpu.attacks.fgsm import _xent  # noqa: E402
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.defense import reconstruct, sample_z0  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models.generator import from_image_space  # noqa: E402


def _setup():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=4, num_classes=10)
    gan = DefenseGAN(cfg)

    def logits_fn(x):
        v = jnp.mean(jnp.square(x), axis=(1, 2, 3))
        return jnp.stack([v, -v] + [0 * v] * 8, axis=-1)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 1),
                    jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)
    key = jax.random.key(11)
    return cfg, gan, logits_fn, x, labels, key


def _manual_res(cfg, gan, x, key):
    def gen_apply(z):
        return gan.generator.apply(
            {"params": gan.state.gen_params,
             "batch_stats": gan.state.gen_stats}, z, train=False)

    z0 = sample_z0(key, x.shape[0], cfg.rec_rr, cfg.latent_dim)
    return reconstruct(gen_apply, x, z0, rec_iters=cfg.rec_iters,
                       rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum)


@pytest.mark.parametrize("grad_mode", ["exact", "bpda"])
def test_zero_penalty_equals_xent_of_target(grad_mode):
    cfg, gan, logits_fn, x, labels, key = _setup()
    loss = make_attack_loss(gan, logits_fn, cfg, grad_mode=grad_mode)
    tgt = make_attack_target(gan, logits_fn, cfg, grad_mode=grad_mode)
    np.testing.assert_allclose(np.asarray(loss(x, labels, key)),
                               np.asarray(_xent(tgt(x, key), labels)),
                               rtol=1e-5, atol=1e-6)


def test_penalty_subtracts_exact_detector_statistic():
    cfg, gan, logits_fn, x, labels, key = _setup()
    lam = 3.0
    l0 = make_attack_loss(gan, logits_fn, cfg)(x, labels, key)
    lp = make_attack_loss(gan, logits_fn, cfg,
                          rec_penalty=lam)(x, labels, key)
    rec = _manual_res(cfg, gan, x, key).loss
    np.testing.assert_allclose(np.asarray(l0 - lp), lam * np.asarray(rec),
                               rtol=1e-4, atol=1e-6)


def test_bpda_penalty_gradient_is_straight_through_statistic():
    cfg, gan, logits_fn, x, labels, key = _setup()
    lam = 2.0
    g0 = jax.grad(lambda u: jnp.sum(make_attack_loss(
        gan, logits_fn, cfg, grad_mode="bpda")(u, labels, key)))(x)
    gp = jax.grad(lambda u: jnp.sum(make_attack_loss(
        gan, logits_fn, cfg, grad_mode="bpda",
        rec_penalty=lam)(u, labels, key)))(x)
    # penalty part: d/dx of -lam * mean((2x-1 - t_hat)^2) with t_hat const
    t_hat = from_image_space(_manual_res(cfg, gan, x, key).x_hat)
    d = from_image_space(x) - t_hat
    n_pix = int(np.prod(x.shape[1:]))
    expected = -lam * (2.0 * d) * 2.0 / n_pix  # chain: d t_x/dx = 2
    np.testing.assert_allclose(np.asarray(gp - g0), np.asarray(expected),
                               rtol=1e-4, atol=1e-6)


def test_centered_penalty_targets_the_clean_median():
    """rec_center=c switches the penalty to (rec - c)^2 — the counter to
    the two-sided detector: minimized AT the center, not below it."""
    cfg, gan, logits_fn, x, labels, key = _setup()
    lam, c = 3.0, 0.05
    l0 = make_attack_loss(gan, logits_fn, cfg)(x, labels, key)
    lc = make_attack_loss(gan, logits_fn, cfg, rec_penalty=lam,
                          rec_center=c)(x, labels, key)
    rec = np.asarray(_manual_res(cfg, gan, x, key).loss)
    np.testing.assert_allclose(np.asarray(l0 - lc), lam * (rec - c) ** 2,
                               rtol=1e-4, atol=1e-6)
    # at rec == c the centered penalty vanishes (attack loss == xent)
    lc_at = make_attack_loss(gan, logits_fn, cfg, rec_penalty=lam,
                             rec_center=float(rec[0]))(x, labels, key)
    assert abs(float(lc_at[0] - l0[0])) < 1e-5


def test_cli_guard_center_requires_penalty():
    from defensegan_tpu.cli import whitebox
    with pytest.raises(SystemExit) as ex:
        whitebox.main(["--attack_type", "pgd",
                       "--defense_type", "defense_gan",
                       "--pgd_rec_center", "0.002"])
    assert ex.value.code == 2


def test_pgd_with_penalized_loss_runs_and_stays_in_ball():
    cfg, gan, logits_fn, x, labels, key = _setup()
    loss = make_attack_loss(gan, logits_fn, cfg, grad_mode="bpda",
                            rec_penalty=10.0)
    adv = pgd(logits_fn, x, labels, eps=0.3, eps_iter=0.1, nb_iter=3,
              key=key, keyed_logits=True, loss_fn=loss)
    adv = np.asarray(adv)
    assert np.all(np.abs(adv - np.asarray(x)) <= 0.3 + 1e-6)
    assert np.all(np.isfinite(adv))


def test_cli_guard_requires_pgd_through_defense():
    from defensegan_tpu.cli import whitebox
    for argv in (["--attack_type", "fgsm", "--defense_type", "defense_gan",
                  "--pgd_rec_penalty", "1.0"],
                 ["--attack_type", "pgd", "--defense_type", "defense_gan",
                  "--attack_through_defense", "no",
                  "--pgd_rec_penalty", "1.0"]):
        with pytest.raises(SystemExit) as ex:
            whitebox.main(argv)
        assert ex.value.code == 2
