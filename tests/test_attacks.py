"""Attack tests (SURVEY.md section 4 item (d): closed-form FGSM on a linear
model, CW-L2 behavior, RAND+FGSM bounds). Reference semantics: cleverhans
FastGradientMethod / CarliniWagnerL2 as used by whitebox.py of
kabkabm/defensegan."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.attacks import (CWConfig, carlini_wagner_l2,
                                    carlini_wagner_l2_chunked,
                                    fgsm, make_chunked_cw, rand_fgsm)
from defensegan_tpu.data.synthetic import make_synthetic
from defensegan_tpu.eval import model_eval, train_classifier
from defensegan_tpu.models import build_classifier

HW = 28


def _linear_logits_fn(W):
    Wj = jnp.asarray(W)

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ Wj

    return logits_fn


def test_fgsm_closed_form_linear_model():
    """For logits = x @ W, grad_x xent = (softmax - onehot) @ W^T; FGSM must
    equal x + eps*sign(that), clipped."""
    rng = np.random.RandomState(0)
    W = rng.randn(HW * HW, 10).astype(np.float32)
    x = rng.rand(4, HW, HW, 1).astype(np.float32)
    y = rng.randint(0, 10, 4)
    eps = 0.3

    logits_fn = _linear_logits_fn(W)
    adv = fgsm(logits_fn, jnp.asarray(x), jnp.asarray(y), eps)

    logits = x.reshape(4, -1) @ W
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    onehot = np.eye(10)[y]
    gflat = (p - onehot) @ W.T / 4.0  # mean over batch
    expected = np.clip(x + eps * np.sign(gflat.reshape(x.shape)), 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(adv), expected, atol=1e-5)


def _trained_small_classifier():
    x, y = make_synthetic(512, HW, 1, seed=3)
    model = build_classifier("E")
    state = train_classifier(model, x, y, key=jax.random.key(0), epochs=5)
    return state, x, y


def test_fgsm_degrades_accuracy():
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    clean = model_eval(logits_fn, x[:256], y[:256])
    assert clean > 0.9, f"classifier failed to fit synthetic data: {clean}"
    adv = np.asarray(fgsm(logits_fn, jnp.asarray(x[:256]),
                          jnp.asarray(y[:256]), 0.3))
    adv_acc = model_eval(logits_fn, adv, y[:256])
    assert adv_acc < clean - 0.3, (clean, adv_acc)
    # box constraints
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.max(np.abs(adv - x[:256])) <= 0.3 + 1e-6


def test_rand_fgsm_bounds():
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    eps, alpha = 0.3, 0.05
    adv = np.asarray(rand_fgsm(logits_fn, jnp.asarray(x[:64]),
                               jnp.asarray(y[:64]), eps, alpha,
                               jax.random.key(1)))
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    assert np.max(np.abs(adv - x[:64])) <= eps + 1e-6


def test_carlini_wagner_l2_flips_predictions_with_small_l2():
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    xb, yb = x[:32], y[:32]
    # only attack correctly-classified points for a clean success metric
    pred = np.asarray(jnp.argmax(logits_fn(jnp.asarray(xb)), -1))
    keep = pred == yb
    xb, yb = xb[keep], yb[keep]
    assert xb.shape[0] >= 16

    # synthetic-data classifier has large logit margins; start the constant
    # search at c=1 so 3 bs steps suffice (defaults need more steps)
    cfg = CWConfig(binary_search_steps=3, max_iterations=200,
                   initial_const=1.0, learning_rate=1e-2)
    adv = np.asarray(carlini_wagner_l2(logits_fn, jnp.asarray(xb),
                                       jnp.asarray(yb), cfg))
    adv_pred = np.asarray(jnp.argmax(logits_fn(jnp.asarray(adv)), -1))
    success = (adv_pred != yb).mean()
    assert success > 0.8, f"CW success rate too low: {success}"
    l2 = np.sqrt(((adv - xb) ** 2).sum(axis=(1, 2, 3)))
    assert np.median(l2[adv_pred != yb]) < 5.0  # small perturbations
    assert adv.min() >= 0.0 and adv.max() <= 1.0


def test_cw_chunked_matches_fused():
    """The host-chunked driver must execute bit-identical math to the fused
    single-program attack (same step sequence, only dispatch granularity
    differs) — including a chunk size that does not divide max_iterations."""
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    xb, yb = jnp.asarray(x[:16]), jnp.asarray(y[:16])
    cfg = CWConfig(binary_search_steps=2, max_iterations=50,
                   initial_const=1.0, learning_rate=1e-2)
    fused = np.asarray(carlini_wagner_l2(logits_fn, xb, yb, cfg))
    for chunk in (7, 50, 64):
        chunked = np.asarray(carlini_wagner_l2_chunked(
            logits_fn, xb, yb, cfg, chunk_iters=chunk))
        np.testing.assert_allclose(chunked, fused, atol=1e-6,
                                   err_msg=f"chunk_iters={chunk}")


def test_make_chunked_cw_factory_matches_fused_across_batches():
    """The factory's jitted chunk takes batch data as arguments (one
    compile for all same-shape batches); each batch must still match the
    fused driver exactly."""
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    cfg = CWConfig(binary_search_steps=2, max_iterations=30,
                   initial_const=1.0, learning_rate=1e-2)
    attack = make_chunked_cw(logits_fn, cfg, chunk_iters=8)
    for sl in (slice(0, 16), slice(16, 32)):
        xb, yb = jnp.asarray(x[sl]), jnp.asarray(y[sl])
        fused = np.asarray(carlini_wagner_l2(logits_fn, xb, yb, cfg))
        got = np.asarray(attack(xb, yb))
        np.testing.assert_allclose(got, fused, atol=1e-6)


def test_cw_chunked_abort_early_still_attacks():
    """abort_early (cleverhans default) may cut iterations short but must
    still produce in-box adversaries that flip most predictions."""
    state, x, y = _trained_small_classifier()
    logits_fn = state.logits_fn()
    xb, yb = jnp.asarray(x[:16]), jnp.asarray(y[:16])
    cfg = CWConfig(binary_search_steps=2, max_iterations=100,
                   initial_const=1.0, learning_rate=1e-2)
    adv = np.asarray(carlini_wagner_l2_chunked(
        logits_fn, xb, yb, cfg, chunk_iters=10, abort_early=True))
    assert adv.min() >= 0.0 and adv.max() <= 1.0
    adv_pred = np.asarray(jnp.argmax(logits_fn(jnp.asarray(adv)), -1))
    assert (adv_pred != y[:16]).mean() > 0.5


def test_cw_returns_original_where_it_fails():
    """With c tiny and 1 iteration, no attack found -> x returned."""
    state, x, y = _trained_small_classifier()
    cfg = CWConfig(binary_search_steps=1, max_iterations=1,
                   initial_const=1e-10, learning_rate=1e-12)
    adv = np.asarray(carlini_wagner_l2(state.logits_fn(),
                                       jnp.asarray(x[:8]),
                                       jnp.asarray(y[:8]), cfg))
    # anywhere the hinge was already satisfied (misclassified) tiny motion is
    # possible; for correctly-classified points the original comes back
    pred = np.asarray(jnp.argmax(state.logits_fn()(jnp.asarray(x[:8])), -1))
    correct = pred == y[:8]
    np.testing.assert_allclose(adv[correct], x[:8][correct], atol=1e-5)


def test_eot_over_keys_is_mean_of_keyed_targets_and_differentiable():
    """eot_over_keys(f, K)(x, key) == mean_k f(x, split(key, K)[k]), K=1 is
    the identity wrapper, and gradients flow to x through the average —
    the vote-aware counter-attack's contract (attacks/compose.py)."""
    from defensegan_tpu.attacks import eot_over_keys

    W = jax.random.normal(jax.random.key(0), (HW * HW, 10))

    def keyed_target(x, key):
        # key-dependent stochastic defended target: logits of x + noise(key)
        noise = 0.1 * jax.random.normal(key, x.shape)
        return (x + noise).reshape(x.shape[0], -1) @ W

    assert eot_over_keys(keyed_target, 1) is keyed_target

    x = jax.random.uniform(jax.random.key(1), (4, HW, HW, 1))
    key = jax.random.key(2)
    eot = eot_over_keys(keyed_target, 3)
    got = eot(x, key)
    keys = jax.random.split(key, 3)
    want = jnp.mean(jnp.stack([keyed_target(x, k) for k in keys]), axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    g = jax.grad(lambda xx: jnp.sum(eot(xx, key) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
