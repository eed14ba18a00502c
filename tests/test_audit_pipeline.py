"""Random-audit serving cascade (defense/audit.py): cheap serve +
p-probability expensive audit. No reference equivalent (the reference
ships no serving surface) — these tests are the spec; the security
rationale is RESULTS.md round 5c/5e."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.defense import AuditedPipeline, DefendedPipeline  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402


def _tiny_gan():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5)
    return DefenseGAN(cfg)


def _logits_fn(xb):
    m = jnp.mean(xb, axis=(1, 2, 3))
    return jnp.stack([1.0 - m, m], -1)


def _logits_fn_inv(xb):
    # inverted head: always disagrees with _logits_fn (no ties: the
    # brightness split is strict for any non-0.5 mean)
    m = jnp.mean(xb, axis=(1, 2, 3))
    return jnp.stack([m, 1.0 - m], -1)


def _pipes(gan, audit_logits=_logits_fn):
    serve = DefendedPipeline(gan, _logits_fn, fpr=0.25,
                             rec_rr=1, rec_iters=2)
    audit = DefendedPipeline(gan, audit_logits, fpr=0.25)
    return serve, audit


def test_audit_validates_args_and_calibration():
    gan = _tiny_gan()
    serve, audit = _pipes(gan)
    with pytest.raises(ValueError):
        AuditedPipeline(serve, audit, audit_prob=0.0)
    with pytest.raises(ValueError):
        AuditedPipeline(serve, audit, audit_prob=1.5)
    pipe = AuditedPipeline(serve, audit, audit_prob=0.5)
    assert not pipe.calibrated
    with pytest.raises(RuntimeError):
        pipe.predict(np.zeros((2, 28, 28, 1), np.float32))


def test_audit_calibrates_both_and_selection_is_deterministic():
    gan = _tiny_gan()
    serve, audit = _pipes(gan)
    pipe = AuditedPipeline(serve, audit, audit_prob=0.5)
    x_cal = np.asarray(gan.generate(jax.random.key(0), 16))
    pipe.calibrate(x_cal, key=jax.random.key(1), batch_size=8)
    assert pipe.calibrated and serve.calibrated and audit.calibrated

    x = np.asarray(gan.generate(jax.random.key(2), 32))
    out1 = pipe.predict(x, key=jax.random.key(3), batch_size=8)
    out2 = pipe.predict(x, key=jax.random.key(3), batch_size=8)
    np.testing.assert_array_equal(out1.audited, out2.audited)
    np.testing.assert_array_equal(out1.pred, out2.pred)
    np.testing.assert_array_equal(out1.flagged, out2.flagged)
    # p=0.5 over 32 draws: some but not all audited (deterministic
    # given the fixed key; bound is loose on purpose)
    assert 0 < out1.audited.sum() < 32
    # a different key reshuffles the audit subset
    out3 = pipe.predict(x, key=jax.random.key(4), batch_size=8)
    assert not np.array_equal(out1.audited, out3.audited)


def test_audited_rows_take_audit_pred_and_flag_or():
    gan = _tiny_gan()
    # audit head always disagrees with serve head -> routing is visible
    serve, audit = _pipes(gan, audit_logits=_logits_fn_inv)
    pipe = AuditedPipeline(serve, audit, audit_prob=0.5)
    x_cal = np.asarray(gan.generate(jax.random.key(0), 16))
    pipe.calibrate(x_cal, key=jax.random.key(1), batch_size=8)
    x = np.asarray(gan.generate(jax.random.key(2), 24))
    out = pipe.predict(x, key=jax.random.key(3), batch_size=8)
    a = out.audited
    assert a.any() and (~a).any()
    # audited rows report the AUDIT pipeline's prediction...
    np.testing.assert_array_equal(out.pred[a], out.audit.pred)
    assert (out.pred[a] != out.serve.pred[a]).all()
    # ...unaudited rows keep the serve prediction
    np.testing.assert_array_equal(out.pred[~a], out.serve.pred[~a])
    # flag = serve OR audit on audited rows; serve alone elsewhere
    np.testing.assert_array_equal(
        out.flagged[a], out.serve.flagged[a] | out.audit.flagged)
    np.testing.assert_array_equal(out.flagged[~a], out.serve.flagged[~a])


def test_audit_prob_one_is_full_escalation():
    gan = _tiny_gan()
    serve, audit = _pipes(gan)
    pipe = AuditedPipeline(serve, audit, audit_prob=1.0)
    x_cal = np.asarray(gan.generate(jax.random.key(0), 16))
    pipe.calibrate(x_cal, key=jax.random.key(1), batch_size=8)
    x = np.asarray(gan.generate(jax.random.key(2), 12))
    out = pipe.predict(x, key=jax.random.key(3), batch_size=8)
    assert out.audited.all()
    np.testing.assert_array_equal(out.pred, out.audit.pred)
    # off-manifold noise is flagged by the audit detector even if the
    # (weaker) serve config misses it
    x_off = np.asarray(jax.random.uniform(jax.random.key(5),
                                          (8, 28, 28, 1)))
    out_off = pipe.predict(x_off, key=jax.random.key(6), batch_size=8)
    assert out_off.flagged.mean() >= 0.75
