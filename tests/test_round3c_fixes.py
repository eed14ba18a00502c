"""Regression tests for the round-3 code-review findings:

- attacks/compose.py is the single source of truth for the
  attack-through-defense composition AND the per-batch key derivation:
  the --eval_z0 both replay leg must reproduce the craft loop's z0 keys
  exactly (a hand-re-derived key_fn desynchronizing silently was the
  review's top risk);
- whitebox rejects --eval_z0 both at parse time when the replay
  precondition can't hold (previously it burned the full attack+eval
  pipeline and silently skipped the leg);
- bench.py refuses a USER-explicit --kernel that is not runnable instead
  of silently measuring the degraded path under the headline metric.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.attacks import (attack_batch_key, attack_z0_key,  # noqa: E402
                                    make_attack_target, split_rand_fgsm_key)
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402


# ---------------------------------------------- key derivation coupling
def test_attack_z0_key_matches_craft_derivation():
    """Replay keys == the keys the craft loop consumed, for every attack.

    Mirrors cli/whitebox.py's craft loop: batch at offset lo gets
    attack_batch_key(k_att, lo); fgsm/cw feed that key straight to
    attack_target; rand_fgsm splits it via split_rand_fgsm_key and feeds
    the first half.
    """
    k_att = jax.random.key(123)
    for lo in (0, 64, 128):
        k_batch = attack_batch_key(k_att, lo)
        # fgsm / cw: attack_target consumes the batch key itself
        for attack in ("fgsm", "cw"):
            assert jnp.array_equal(
                jax.random.key_data(attack_z0_key(k_att, lo, attack)),
                jax.random.key_data(k_batch))
        # rand_fgsm: attack_target consumes the first split half
        kz, kn = split_rand_fgsm_key(k_batch)
        assert jnp.array_equal(
            jax.random.key_data(attack_z0_key(k_att, lo, "rand_fgsm")),
            jax.random.key_data(kz))
        assert not jnp.array_equal(jax.random.key_data(kz),
                                   jax.random.key_data(kn))


# ------------------------------------------------ shared attack target
def test_make_attack_target_composition():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=3, num_classes=10)
    gan = DefenseGAN(cfg)

    calls = {}

    def logits_fn(x):
        calls["shape"] = x.shape
        return jnp.zeros((x.shape[0], 10)).at[:, 0].set(jnp.mean(x))

    tgt = make_attack_target(gan, logits_fn, cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 1),
                    jnp.float32)
    key = jax.random.key(5)
    out = tgt(x, key)
    assert out.shape == (2, 10)
    assert calls["shape"] == x.shape  # classifier sees purified images

    # back_prop=True: the composition must be differentiable w.r.t. x
    g = jax.grad(lambda x: tgt(x, key).sum())(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))

    # rec_iters override is honored (different L => different output)
    tgt_short = make_attack_target(gan, logits_fn, cfg, rec_iters=1)
    assert not jnp.allclose(out, tgt_short(x, key))
    # same inputs give the same graph output (deterministic in key)
    assert jnp.array_equal(out, tgt(x, key))


# ------------------------------------------- parse-time eval_z0 guard
@pytest.mark.parametrize("argv", [
    ["--attack_type", "fgsm", "--defense_type", "none",
     "--eval_z0", "both"],
    ["--attack_type", "none", "--defense_type", "defense_gan",
     "--eval_z0", "both"],
    ["--attack_type", "fgsm", "--defense_type", "defense_gan",
     "--attack_through_defense", "no", "--eval_z0", "both"],
])
def test_whitebox_rejects_vacuous_eval_z0_both(argv):
    from defensegan_tpu.cli import whitebox

    with pytest.raises(SystemExit) as ex:
        whitebox.main(argv)
    assert ex.value.code == 2  # argparse error, before any work


# ------------------------------------------- bench explicit-kernel guard
def test_bench_refuses_unrunnable_explicit_kernel():
    """--kernel pallas off-TPU (or an unsatisfiable topology) must fail
    the leg (never silently measure the degraded path as the headline) —
    the round-5 worker catches the error, notes it on stderr, and the
    record simply never carries the mislabeled kernel."""
    import bench

    cfg_path = os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                            "mnist_fast.yml")
    with pytest.raises(RuntimeError, match="not runnable"):
        bench.measure(cfg_path, batch=8, rec_rr=2, rec_iters=2,
                      repeats=1, kernel="pallas")
