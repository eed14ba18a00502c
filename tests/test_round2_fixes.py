"""Regression tests for the round-1 VERDICT/ADVICE findings:

- reconstruct(rec_iters=0 / rec_rr given) must honor explicit values
  (the old `rec_iters or cfg.rec_iters` silently ignored 0);
- the black-box substitute keeps its params across augmentation rounds
  (reference/cleverhans train_sub semantics);
- train_classifier rejects out-of-range labels (XLA would silently clamp);
- rand_fgsm rejects alpha >= eps (the FGSM step would go non-positive);
- divergence-restore on the FINAL training iteration still writes the final
  checkpoint/sample and does not return the diverged (non-finite) metrics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.attacks import rand_fgsm, train_substitute
from defensegan_tpu.attacks import blackbox as blackbox_mod
from defensegan_tpu.configs import Config
from defensegan_tpu.data.synthetic import make_synthetic
from defensegan_tpu.eval import train_classifier
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.models import build_classifier


def _tiny_cfg(tmp_path, **kw):
    base = dict(type="mnist", gen_dim=4, disc_dim=4, latent_dim=16,
                batch_size=8, disc_iters=1, rec_rr=2, rec_iters=3,
                compute_dtype="float32", sample_every=10**9,
                save_every=10**9, output_dir=str(tmp_path / "run"))
    base.update(kw)
    return Config(**base)


def test_reconstruct_honors_explicit_zero_iters(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    gan = DefenseGAN(cfg)
    x = jnp.asarray(make_synthetic(4, 28, 1, seed=0)[0])
    res0 = gan.reconstruct(x, jax.random.key(0), rec_iters=0, rec_rr=1)
    res3 = gan.reconstruct(x, jax.random.key(0), rec_rr=1)
    # a compiled program must exist under the EXPLICIT (rr=1, iters=0) key
    assert (1, 0, cfg.rec_lr, False) in gan._reconstructors
    assert (1, 3, cfg.rec_lr, False) in gan._reconstructors
    # zero iterations: reconstruction is G(z0), strictly worse than 3 steps
    assert float(jnp.mean(res0.loss)) > float(jnp.mean(res3.loss))


def test_substitute_params_persist_across_rounds(monkeypatch):
    """Rounds after the first must continue from the previous round's params
    (reference: cleverhans train_sub keeps the same variables)."""
    seen_params = []
    real_train = blackbox_mod.train_classifier

    def recording_train(model, x, y, **kw):
        seen_params.append(kw.get("params"))
        return real_train(model, x, y, **kw)

    monkeypatch.setattr(blackbox_mod, "train_classifier", recording_train)

    x_seed, _ = make_synthetic(16, 28, 1, seed=3)

    def oracle(xb):
        m = jnp.mean(xb, axis=(1, 2, 3))
        return jax.nn.one_hot((m * 10).astype(jnp.int32) % 10, 10)

    state, _ = train_substitute(build_classifier("E"), oracle, x_seed,
                                key=jax.random.key(0), data_aug=3,
                                epochs_per_round=1)
    assert seen_params[0] is None
    assert all(p is not None for p in seen_params[1:]), \
        "later rounds must continue from the previous round's params"

    # ablation flag: from-scratch retraining every round
    seen_params.clear()
    train_substitute(build_classifier("E"), oracle, x_seed,
                     key=jax.random.key(0), data_aug=2, epochs_per_round=1,
                     persistent=False)
    assert all(p is None for p in seen_params)


def test_train_classifier_rejects_out_of_range_labels():
    x, _ = make_synthetic(32, 28, 1, seed=4)
    y_bad = np.full(32, 10, np.int32)  # 10-way classifier: valid is 0..9
    with pytest.raises(ValueError, match="labels out of range"):
        train_classifier(build_classifier("E"), x, y_bad,
                         key=jax.random.key(0), epochs=1)
    y_neg = np.full(32, -1, np.int32)
    with pytest.raises(ValueError, match="labels out of range"):
        train_classifier(build_classifier("E"), x, y_neg,
                         key=jax.random.key(0), epochs=1)


def test_rand_fgsm_rejects_alpha_ge_eps():
    x = jnp.zeros((2, 28, 28, 1))
    y = jnp.zeros((2,), jnp.int32)

    def logits_fn(xx):
        return jnp.tile(jnp.arange(10.0), (xx.shape[0], 1))

    with pytest.raises(ValueError, match="alpha < eps"):
        rand_fgsm(logits_fn, x, y, eps=0.05, alpha=0.05,
                  key=jax.random.key(0))


def test_divergence_restore_on_final_iter_saves_and_returns_finite(tmp_path):
    cfg = _tiny_cfg(tmp_path, sample_every=10**9, save_every=10**9)
    gan = DefenseGAN(cfg)
    gan.save()  # a checkpoint to restore from (step 0)
    ckpt0 = os.path.join(cfg.output_dir, "checkpoints", "0")
    mtime_before = os.path.getmtime(ckpt0)

    calls = {"n": 0}

    def poisoned_final_step(state, data, key):
        calls["n"] += 1
        bad = calls["n"] == 3  # diverge exactly on the final iteration
        metrics = {"d_loss": jnp.float32(np.nan if bad else 0.1),
                   "g_loss": jnp.float32(0.2), "gp": jnp.float32(0.0),
                   "wasserstein": jnp.float32(0.3)}
        return state.replace(step=state.step + 1), metrics

    gan._train_step = poisoned_final_step
    images, _ = make_synthetic(32, 28, 1, seed=5)
    out = gan.train(images, train_iters=3, log_every=1, quiet=True,
                    on_divergence="restore")
    # returned metrics are the last finite ones, not the diverged step's
    assert all(np.isfinite(v) for v in out.values()), out
    assert out["d_loss"] == pytest.approx(0.1)
    # the final-iteration save still happened (it == iters branch): the
    # restored state is step 0, so step-0 checkpoint gets re-written
    assert os.path.getmtime(ckpt0) > mtime_before
    # and the final sample grid was written on the restored state
    samples = os.listdir(os.path.join(cfg.output_dir, "samples"))
    assert any(name.endswith("0000003.png") for name in samples), samples
