"""PGD (attacks/pgd.py — Madry et al.; beyond the reference's attack
suite, it powers the BPDA adaptive attack of Athalye et al. 2018).

Covers: eps-ball + clip invariants, fused == chunked exactly, targeted
direction, per-step vs fixed keys for stochastic targets, attack
effectiveness on a linear model, and the CLI replay guard."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.attacks import make_chunked_pgd, pgd  # noqa: E402

EPS, EPS_ITER, NB = 0.3, 0.05, 12


def _linear_setup():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(784, 10), jnp.float32)

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ w

    x = jnp.asarray(rng.rand(8, 28, 28, 1), jnp.float32)
    labels = jnp.argmax(logits_fn(x), -1)  # correctly-classified by defn
    return logits_fn, x, labels


def test_pgd_ball_and_clip_invariants():
    logits_fn, x, labels = _linear_setup()
    adv = pgd(logits_fn, x, labels, EPS, EPS_ITER, NB,
              key=jax.random.key(0))
    adv = np.asarray(adv)
    assert np.all(np.abs(adv - np.asarray(x)) <= EPS + 1e-6)
    assert adv.min() >= 0.0 and adv.max() <= 1.0


def test_pgd_beats_single_step_on_linear_model():
    logits_fn, x, labels = _linear_setup()
    adv = pgd(logits_fn, x, labels, EPS, EPS_ITER, NB,
              key=jax.random.key(0))
    acc = float(jnp.mean(jnp.argmax(logits_fn(adv), -1) == labels))
    assert acc <= 0.25  # 12 steps * 0.05 covers the 0.3 ball


def test_chunked_matches_fused_exactly():
    logits_fn, x, labels = _linear_setup()
    key = jax.random.key(7)
    fused = pgd(logits_fn, x, labels, EPS, EPS_ITER, NB, key=key)
    for chunk in (1, 5, NB, NB + 3):
        chunked = make_chunked_pgd(logits_fn, EPS, EPS_ITER, NB,
                                   chunk_iters=chunk)(x, labels, key)
        np.testing.assert_array_equal(np.asarray(fused),
                                      np.asarray(chunked))


def test_targeted_reaches_target_class():
    logits_fn, x, labels = _linear_setup()
    target = (labels + 3) % 10
    adv = pgd(logits_fn, x, target, EPS, EPS_ITER, NB,
              key=jax.random.key(1), targeted=True)
    hit = float(jnp.mean(jnp.argmax(logits_fn(adv), -1) == target))
    miss = float(jnp.mean(jnp.argmax(logits_fn(adv), -1) == labels))
    assert hit > miss


def test_keyed_per_step_vs_fixed_differ_and_fixed_uses_one_key():
    # stochastic target: logits depend on the key, so per-step EOT keys
    # and a pinned key must produce different trajectories
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(784, 10), jnp.float32)

    def keyed_logits(x, key):
        jitter = jax.random.normal(key, (10,)) * 0.5
        return x.reshape(x.shape[0], -1) @ w + jitter

    x = jnp.asarray(rng.rand(4, 28, 28, 1), jnp.float32)
    labels = jnp.zeros((4,), jnp.int32)
    key = jax.random.key(9)
    kw = dict(keyed_logits=True, rand_init=False)
    a_per = pgd(keyed_logits, x, labels, EPS, EPS_ITER, 6, key=key,
                per_step_keys=True, **kw)
    a_fix = pgd(keyed_logits, x, labels, EPS, EPS_ITER, 6, key=key,
                per_step_keys=False, **kw)
    assert not np.array_equal(np.asarray(a_per), np.asarray(a_fix))

    # fixed mode consumes the raw key every step: one manual step from x
    # with that key matches the first fixed-mode step
    one = pgd(keyed_logits, x, labels, EPS, EPS_ITER, 1, key=key,
              per_step_keys=False, **kw)
    g = jax.grad(lambda xx: jnp.mean(
        -jax.nn.log_softmax(keyed_logits(xx, key))[:, 0]))(x)
    manual = jnp.clip(jnp.clip(x + EPS_ITER * jnp.sign(g),
                               x - EPS, x + EPS), 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(one), np.asarray(manual),
                               rtol=1e-6, atol=1e-7)


def test_key_required_when_stochastic():
    logits_fn, x, labels = _linear_setup()
    with pytest.raises(ValueError):
        pgd(logits_fn, x, labels, EPS, EPS_ITER, 2)  # rand_init, no key
    with pytest.raises(ValueError):
        make_chunked_pgd(logits_fn, EPS, EPS_ITER, 2)(x, labels)
    # deterministic variant needs no key
    adv = pgd(logits_fn, x, labels, EPS, EPS_ITER, 2, rand_init=False)
    assert np.all(np.isfinite(np.asarray(adv)))
    adv_c = make_chunked_pgd(logits_fn, EPS, EPS_ITER, 2,
                             rand_init=False)(x, labels)
    np.testing.assert_array_equal(np.asarray(adv), np.asarray(adv_c))


def test_cli_guard_rejects_per_step_replay():
    from defensegan_tpu.cli import whitebox
    with pytest.raises(SystemExit) as ex:
        whitebox.main(["--attack_type", "pgd", "--defense_type",
                       "defense_gan", "--eval_z0", "both"])
    assert ex.value.code == 2
