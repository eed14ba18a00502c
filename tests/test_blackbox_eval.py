"""Black-box substitute pipeline + eval harness tests (reference:
blackbox.py and utils/gan_defense.py::model_eval_gan of kabkabm/defensegan)."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.attacks import fgsm, jacobian_augmentation, train_substitute
from defensegan_tpu.configs import Config
from defensegan_tpu.data.synthetic import make_synthetic
from defensegan_tpu.eval import model_eval, model_eval_gan, train_classifier
from defensegan_tpu.gan import DefenseGAN
from defensegan_tpu.models import build_classifier

HW = 28


def test_jacobian_augmentation_linear_formula():
    """For substitute logits = x @ W, d Z_y / dx = W[:, y]; x' must be
    x + lmbda * sign(W[:, y])."""
    rng = np.random.RandomState(0)
    W = rng.randn(HW * HW, 10).astype(np.float32)

    def sub_logits(x):
        return x.reshape(x.shape[0], -1) @ jnp.asarray(W)

    x = rng.rand(3, HW, HW, 1).astype(np.float32) * 0.5 + 0.25
    y = np.array([1, 4, 7])
    lmbda = 0.1
    out = np.asarray(jacobian_augmentation(sub_logits, jnp.asarray(x),
                                           jnp.asarray(y), lmbda))
    expected = np.clip(
        x + lmbda * np.sign(W[:, y].T.reshape(x.shape)), 0.0, 1.0)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_substitute_pipeline_transfers():
    """End-to-end mnist_blackbox recipe on synthetic data: substitute agrees
    with the oracle and its FGSM transfers to the target."""
    x_train, y_train = make_synthetic(768, HW, 1, seed=5)
    x_test, y_test = make_synthetic(256, HW, 1, seed=5, split="test")

    bb = train_classifier(build_classifier("E"), x_train, y_train,
                          key=jax.random.key(0), epochs=5)
    bb_logits = bb.logits_fn()
    assert model_eval(bb_logits, x_test, y_test) > 0.9

    sub, x_sub = train_substitute(build_classifier("E"), bb_logits,
                                  x_test[:64], key=jax.random.key(1),
                                  data_aug=3, lmbda=0.1,
                                  epochs_per_round=20)
    assert x_sub.shape[0] == 64 * 4  # doubled twice
    oracle_on_test = np.asarray(jnp.argmax(bb_logits(jnp.asarray(
        x_test[64:192])), -1))
    agree = model_eval(sub.logits_fn(), x_test[64:192], oracle_on_test)
    assert agree > 0.55, f"substitute agreement too low: {agree}"

    adv = np.asarray(fgsm(sub.logits_fn(), jnp.asarray(x_test[64:192]),
                          jnp.asarray(y_test[64:192]), 0.3))
    transfer_acc = model_eval(bb_logits, adv, y_test[64:192])
    clean_acc = model_eval(bb_logits, x_test[64:192], y_test[64:192])
    assert transfer_acc < clean_acc - 0.2, (clean_acc, transfer_acc)


def test_model_eval_gan_runs_and_pads():
    cfg = Config(type="mnist", gen_dim=4, disc_dim=4, latent_dim=16,
                 rec_rr=2, rec_iters=3, compute_dtype="float32",
                 output_dir="/tmp/dgan-test-eval")
    gan = DefenseGAN(cfg)
    x, y = make_synthetic(70, HW, 1, seed=7)  # not a multiple of batch 32

    def logits_fn(xb):  # classify by mean intensity bucket — just mechanics
        m = jnp.mean(xb, axis=(1, 2, 3), keepdims=False)
        return jax.nn.one_hot((m * 10).astype(jnp.int32) % 10, 10)

    acc = model_eval_gan(gan, logits_fn, x, y, batch_size=32)
    assert 0.0 <= acc <= 1.0


def test_adv_training_improves_robustness():
    """adv_tr baseline: FGSM-trained classifier is more robust at eps=0.3."""
    x, y = make_synthetic(512, HW, 1, seed=9)
    plain = train_classifier(build_classifier("E"), x, y,
                             key=jax.random.key(0), epochs=5)
    robust = train_classifier(build_classifier("E"), x, y,
                              key=jax.random.key(0), epochs=5, adv_eps=0.3)
    xb, yb = x[:128], y[:128]
    # eps=0.3 saturates both models on this synthetic set; 0.1 separates them
    adv_p = np.asarray(fgsm(plain.logits_fn(), jnp.asarray(xb),
                            jnp.asarray(yb), 0.1))
    adv_r = np.asarray(fgsm(robust.logits_fn(), jnp.asarray(xb),
                            jnp.asarray(yb), 0.1))
    acc_plain = model_eval(plain.logits_fn(), adv_p, yb)
    acc_robust = model_eval(robust.logits_fn(), adv_r, yb)
    assert acc_robust > acc_plain, (acc_plain, acc_robust)
