"""SPSA gradient-free attack (attacks/spsa.py) — estimator correctness,
common-random-number pairing, freeze-on-success semantics, CLI wiring.

Beyond-reference capability (Uesato et al. 2018, arXiv:1802.05666);
kabkabm/defensegan's whitebox.py has no gradient-free attack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.attacks import make_spsa, margin_loss

SHAPE = (4, 4, 1)


def test_margin_loss_sign_is_success():
    logits = jnp.array([[2.0, 1.0, 0.0],
                        [0.0, 3.0, 0.0]])
    labels = jnp.array([0, 2])
    m = margin_loss(logits, labels)
    # ex0 correctly classified: max other (1) - true (2) = -1
    # ex1 misclassified: max other (3) - true (0) = +3
    np.testing.assert_allclose(np.asarray(m), [-1.0, 3.0])


def test_spsa_estimates_linear_gradient_and_saturates_ball():
    """On loss <w, x>, the SPSA estimator's expectation IS w, so Adam
    ascent must push the perturbation to the eps-ball corner sign(w)."""
    key = jax.random.key(0)
    # magnitudes bounded away from 0 so every coordinate's sign is
    # recoverable above the estimator noise
    kw1, kw2 = jax.random.split(key)
    w = (jnp.sign(jax.random.normal(kw1, (1,) + SHAPE))
         * (0.5 + jax.random.uniform(kw2, (1,) + SHAPE)))
    # keep x away from the [0,1] walls so the domain clip never binds
    x = jnp.full((2,) + SHAPE, 0.5)
    labels = jnp.zeros((2,), jnp.int32)

    def loss_fn(x_flat, y_flat, k):
        return jnp.sum(x_flat * w, axis=(1, 2, 3))

    eps = 0.1
    attack = make_spsa(loss_fn, eps=eps, nb_iter=25, n_samples=16,
                       delta=0.01, lr=0.02, chunk_samples=4,
                       freeze_on_success=False)
    x_adv = attack(x, labels, jax.random.key(1))
    p = np.asarray(x_adv - x)
    agree = np.mean(np.sign(p) == np.sign(np.asarray(w)))
    assert agree > 0.95, f"sign agreement {agree}"
    # and the ball is (near-)saturated in magnitude
    assert np.abs(p).mean() > 0.8 * eps
    assert np.abs(p).max() <= eps + 1e-6


def test_spsa_pairs_share_the_defense_key():
    """+delta*v and -delta*v probes of one chunk must be evaluated under
    the SAME key (common random numbers: identical restart z0), and the
    key must CHANGE across chunks/iterations (EOT averaging)."""
    seen = []

    def loss_fn(x_flat, y_flat, k):
        seen.append(np.asarray(jax.random.key_data(k)).tolist())
        return jnp.zeros((x_flat.shape[0],))

    x = jnp.full((2,) + SHAPE, 0.5)
    labels = jnp.zeros((2,), jnp.int32)
    attack = make_spsa(loss_fn, eps=0.1, nb_iter=2, n_samples=4,
                       delta=0.01, chunk_samples=2, freeze_on_success=True)
    attack(x, labels, jax.random.key(0))
    # per iteration: 1 current-point eval + 2 chunks x (plus, minus)
    assert len(seen) == 2 * (1 + 2 * 2)
    for it in range(2):
        base = it * 5
        cur, p0, m0, p1, m1 = seen[base:base + 5]
        assert p0 == m0 and p1 == m1, "pair signs must share a key"
        assert p0 != p1, "chunks must draw fresh defense keys"
        assert cur not in (p0, p1), "current-point key is its own stream"
    assert seen[0:5] != seen[5:10], "iterations must draw fresh keys"


def test_spsa_freeze_on_success_keeps_successful_examples_fixed():
    """Examples whose loss is already > 0 (misclassified) must keep their
    perturbation; the rest keep being optimized."""
    x = jnp.full((2,) + SHAPE, 0.5)
    labels = jnp.array([0, 1], jnp.int32)  # label carries the example id

    def loss_fn(x_flat, y_flat, k):
        # example with label 0: always successful (loss +10); label 1:
        # never (loss grows with pixel sum but stays negative)
        s = jnp.sum(x_flat, axis=(1, 2, 3))
        return jnp.where(y_flat == 0, 10.0, s - 100.0)

    attack = make_spsa(loss_fn, eps=0.1, nb_iter=5, n_samples=8,
                       delta=0.01, lr=0.05, chunk_samples=4,
                       freeze_on_success=True)
    x_adv = attack(x, labels, jax.random.key(2))
    p = np.asarray(x_adv - x)
    np.testing.assert_allclose(p[0], 0.0, atol=0.0)
    assert np.abs(p[1]).max() > 0.01, "unsuccessful example must move"


def test_spsa_rejects_bad_arguments():
    def loss_fn(x_flat, y_flat, k):
        return jnp.zeros((x_flat.shape[0],))

    with pytest.raises(ValueError):
        make_spsa(loss_fn, eps=0.1, nb_iter=0)
    with pytest.raises(ValueError):
        make_spsa(loss_fn, eps=0.1, n_samples=0)
    attack = make_spsa(loss_fn, eps=0.1, nb_iter=1, n_samples=1)
    with pytest.raises(ValueError):
        attack(jnp.zeros((1,) + SHAPE), jnp.zeros((1,), jnp.int32), None)


def test_whitebox_spsa_flag_validation():
    from defensegan_tpu.cli import whitebox

    # --eval_z0 both has no single z0 to replay under spsa
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--eval_z0", "both"])
    # spsa never uses gradients; bpda would silently do nothing
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--attack_grad", "bpda"])


@pytest.mark.slow
def test_whitebox_spsa_end_to_end(tmp_path, monkeypatch):
    """Tiny end-to-end: train a micro GAN, run the spsa attack THROUGH
    the non-differentiable defense, check the record's spsa fields."""
    monkeypatch.chdir(tmp_path)
    import json
    import os

    from defensegan_tpu.cli import train, whitebox

    cfg_yml = os.path.join(os.path.dirname(__file__), "..",
                           "defensegan_tpu", "configs", "gans", "mnist.yml")
    out = str(tmp_path / "run")
    train.main(["--cfg", cfg_yml, "--output_dir", out, "--is_train",
                "--train_iters", "10",
                "--override", "GEN_DIM=8", "--override", "DISC_DIM=8",
                "--override", "LATENT_DIM=16", "--override", "DISC_ITERS=1",
                "--override", "COMPUTE_DTYPE=float32",
                "--override", "SAMPLE_EVERY=10",
                "--override", "SAVE_EVERY=10",
                "--rec_rr", "2", "--rec_iters", "5", "--batch_size", "8"])
    rec = whitebox.main([
        "--cfg", out, "--attack_type", "spsa", "--defense_type",
        "defense_gan", "--model", "E", "--num_tests", "8",
        "--classifier_epochs", "1", "--attack_batch", "8",
        "--rec_rr", "2", "--rec_iters", "5", "--attack_rec_iters", "3",
        "--spsa_iters", "2", "--spsa_samples", "2", "--spsa_chunk", "2",
        "--results_dir", str(tmp_path / "results")])
    assert rec["attack"] == "spsa"
    assert rec["spsa_iters"] == 2 and rec["spsa_samples"] == 2
    assert rec["attack_grad"] == "none"
    assert rec["attack_z0"] == "per_step"
    assert 0.0 <= rec["defended_acc"] <= 1.0
    lines = open(tmp_path / "results" /
                 "whitebox.jsonl").read().splitlines()
    assert json.loads(lines[-1])["attack"] == "spsa"


def test_whitebox_spsa_rec_penalty_flag_validation():
    from defensegan_tpu.cli import whitebox

    # the penalty term is the through-defense projection loss
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "fgsm",
                       "--spsa_rec_penalty", "1.0"])
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--defense_type", "none",
                       "--spsa_rec_penalty", "1.0"])
    # center without a penalty shapes nothing
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--defense_type",
                       "defense_gan", "--spsa_rec_center", "0.03"])


def test_spsa_penalized_loss_steers_the_detector_statistic():
    """Detection-aware composition: with loss = margin - lam*|s(x) - c|
    where s is a (stand-in) detector statistic, a large lam must drive
    SPSA to reduce |s - c| relative to the margin-only attack.

    Uses an analytic stand-in (s(x) = mean(x), margin = <w, x>) so the
    test isolates the penalized-SPSA optimization itself from GAN
    training noise; the CLI wiring is covered by the end-to-end test."""
    key = jax.random.key(3)
    w = jnp.ones((1,) + SHAPE)
    x = jnp.full((2,) + SHAPE, 0.5)
    labels = jnp.zeros((2,), jnp.int32)
    center = 0.5  # s(x) = mean(x) starts exactly on target

    def margin_only(x_flat, y_flat, k):
        return jnp.sum(w * x_flat, axis=(1, 2, 3))

    lam = 100.0

    def penalized(x_flat, y_flat, k):
        s = jnp.mean(x_flat, axis=(1, 2, 3))
        return margin_only(x_flat, y_flat, k) - lam * jnp.abs(s - center)

    kwargs = dict(eps=0.2, nb_iter=15, n_samples=16, delta=0.01, lr=0.05,
                  freeze_on_success=False)
    x_plain = make_spsa(margin_only, **kwargs)(x, labels, key)
    x_pen = make_spsa(penalized, **kwargs)(x, labels, key)

    # margin-only saturates the ball upward: s ~= 0.7, far from center
    drift_plain = abs(float(jnp.mean(x_plain)) - center)
    drift_pen = abs(float(jnp.mean(x_pen)) - center)
    assert drift_plain > 0.15
    assert drift_pen < 0.25 * drift_plain


@pytest.mark.slow
def test_whitebox_spsa_rec_penalty_end_to_end(tmp_path, monkeypatch):
    """Detection-aware SPSA through a micro GAN: record carries the
    penalty fields and the run completes on the non-differentiable
    defended path with the centered penalty in the loss."""
    monkeypatch.chdir(tmp_path)
    import os

    from defensegan_tpu.cli import train, whitebox

    cfg_yml = os.path.join(os.path.dirname(__file__), "..",
                           "defensegan_tpu", "configs", "gans", "mnist.yml")
    out = str(tmp_path / "run")
    train.main(["--cfg", cfg_yml, "--output_dir", out, "--is_train",
                "--train_iters", "10",
                "--override", "GEN_DIM=8", "--override", "DISC_DIM=8",
                "--override", "LATENT_DIM=16", "--override", "DISC_ITERS=1",
                "--override", "COMPUTE_DTYPE=float32",
                "--override", "SAMPLE_EVERY=10",
                "--override", "SAVE_EVERY=10",
                "--rec_rr", "2", "--rec_iters", "5", "--batch_size", "8"])
    rec = whitebox.main([
        "--cfg", out, "--attack_type", "spsa", "--defense_type",
        "defense_gan", "--model", "E", "--num_tests", "8",
        "--classifier_epochs", "1", "--attack_batch", "8",
        "--rec_rr", "2", "--rec_iters", "5", "--attack_rec_iters", "3",
        "--spsa_iters", "2", "--spsa_samples", "2", "--spsa_chunk", "2",
        "--spsa_rec_penalty", "30", "--spsa_rec_center", "0.05",
        "--detect", "--results_dir", str(tmp_path / "results")])
    assert rec["spsa_rec_penalty"] == 30.0
    assert rec["spsa_rec_center"] == 0.05
    assert rec["detection_auc"] is not None
    assert 0.0 <= rec["defended_acc"] <= 1.0


def test_confident_margin_loss_semantics():
    """Positive iff misclassified; when positive it EQUALS the detector's
    top1-top2 margin; when the classifier is correct it degrades to the
    plain margin loss (best-wrong minus true = margin_loss)."""
    from defensegan_tpu.attacks import confident_margin_loss

    logits = jnp.array([[5.0, 2.0, 1.0],    # correct (y=0)
                        [1.0, 4.0, 3.0],    # wrong (y=0, top1=1)
                        [1.0, 4.0, 3.9]])   # wrong, barely (y=0)
    labels = jnp.array([0, 0, 0])
    c = np.asarray(confident_margin_loss(logits, labels))
    m = np.asarray(margin_loss(logits, labels))
    # correct example: identical to margin loss (z_w - z_y = 2 - 5)
    assert c[0] == m[0] == -3.0
    # wrong examples: c = top1 - top2 of the full logits (the purified-
    # margin statistic the combined detector thresholds)
    np.testing.assert_allclose(c[1], 4.0 - 3.0)
    np.testing.assert_allclose(c[2], 4.0 - 3.9, rtol=1e-6)
    # sign characterizes success exactly
    assert (c > 0).tolist() == [False, True, True]


def test_spsa_rounds_n_samples_up_to_chunk_multiple(capsys):
    """n_samples not divisible by chunk_samples is rounded UP so every
    probe batch shares one shape/compile (round-4 advisor)."""
    calls = []

    def loss_fn(x_flat, y_flat, k):
        calls.append(x_flat.shape[0])
        return jnp.zeros((x_flat.shape[0],))

    attack = make_spsa(loss_fn, eps=0.1, nb_iter=1, n_samples=12,
                       chunk_samples=8, freeze_on_success=False)
    assert "rounding n_samples 12 up to 16" in capsys.readouterr().out
    x = jnp.full((2,) + SHAPE, 0.5)
    attack(x, jnp.zeros((2,), jnp.int32), jax.random.key(0))
    # every probe dispatch is the SAME shape: chunk(8) x batch(2) images
    # per sign — 16 rounded into two full chunks, no odd 4-wide tail
    probe = [s for s in calls if s != 2]  # 2 = the current-point eval
    assert probe == [8 * 2] * 4  # 2 chunks x 2 signs, all full-shape


def test_whitebox_confident_objective_flag_validation():
    from defensegan_tpu.cli import whitebox

    # confident objective targets the purified-margin statistic: needs
    # spsa + defense_gan + through-defense and an explicit kappa
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--defense_type",
                       "defense_gan", "--spsa_objective", "confident"])
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--defense_type", "none",
                       "--spsa_objective", "confident",
                       "--spsa_margin_kappa", "10"])
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "fgsm", "--spsa_objective",
                       "confident", "--spsa_margin_kappa", "10"])
    # kappa only shapes the confident objective
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "spsa", "--defense_type",
                       "defense_gan", "--spsa_margin_kappa", "10"])


@pytest.mark.slow
def test_whitebox_confident_spsa_end_to_end(tmp_path, monkeypatch):
    """The combined-detector counter-attack runs end-to-end through a
    micro GAN and records its objective + kappa provenance."""
    monkeypatch.chdir(tmp_path)
    import os

    from defensegan_tpu.cli import train, whitebox

    cfg_yml = os.path.join(os.path.dirname(__file__), "..",
                           "defensegan_tpu", "configs", "gans", "mnist.yml")
    out = str(tmp_path / "run")
    train.main(["--cfg", cfg_yml, "--output_dir", out, "--is_train",
                "--train_iters", "10",
                "--override", "GEN_DIM=8", "--override", "DISC_DIM=8",
                "--override", "LATENT_DIM=16", "--override", "DISC_ITERS=1",
                "--override", "COMPUTE_DTYPE=float32",
                "--override", "SAMPLE_EVERY=10",
                "--override", "SAVE_EVERY=10",
                "--rec_rr", "2", "--rec_iters", "5", "--batch_size", "8"])
    rec = whitebox.main([
        "--cfg", out, "--attack_type", "spsa", "--defense_type",
        "defense_gan", "--model", "E", "--num_tests", "8",
        "--classifier_epochs", "1", "--attack_batch", "8",
        "--rec_rr", "2", "--rec_iters", "5", "--attack_rec_iters", "3",
        "--spsa_iters", "2", "--spsa_samples", "2", "--spsa_chunk", "2",
        "--spsa_objective", "confident", "--spsa_margin_kappa", "1.5",
        "--spsa_rec_penalty", "30", "--spsa_rec_center", "0.05",
        "--detect", "--detect_save", str(tmp_path / "stats.npz"),
        "--results_dir", str(tmp_path / "results")])
    assert rec["spsa_objective"] == "confident"
    assert rec["spsa_margin_kappa"] == 1.5
    assert rec["detection_auc_combined"] is not None
    stats = np.load(tmp_path / "stats.npz", allow_pickle=False)
    import json
    meta = json.loads(str(stats["meta"]))
    assert meta["spsa_objective"] == "confident"
    assert meta["spsa_margin_kappa"] == 1.5
    # restart-dispersion raw material rides along: [N, R]
    assert stats["all_losses_clean"].shape == (8, 2)
    assert stats["all_losses_adv"].shape == (8, 2)


def test_whitebox_load_adv_and_detect_passes_validation():
    from defensegan_tpu.cli import whitebox

    with pytest.raises(SystemExit):   # load_adv needs attack_type none
        whitebox.main(["--attack_type", "fgsm", "--load_adv", "x.npz"])
    with pytest.raises(SystemExit):   # load_adv + save_adv is circular
        whitebox.main(["--attack_type", "none", "--load_adv", "x.npz",
                       "--save_adv", "y.npz"])
    with pytest.raises(SystemExit):   # detect still needs an adversary
        whitebox.main(["--attack_type", "none", "--detect"])
    with pytest.raises(SystemExit):   # K shapes --detect
        whitebox.main(["--attack_type", "fgsm", "--detect_passes", "4"])
    with pytest.raises(SystemExit):
        whitebox.main(["--attack_type", "fgsm", "--detect",
                       "--detect_passes", "0"])


@pytest.mark.slow
def test_whitebox_replay_with_k_pass_detection(tmp_path, monkeypatch):
    """Craft once with --save_adv, replay with --load_adv under K=3
    detection passes: zero craft time, per-pass arrays [K, N] in the
    detect_save npz, replay provenance in the record."""
    monkeypatch.chdir(tmp_path)
    import json
    import os

    from defensegan_tpu.cli import train, whitebox

    cfg_yml = os.path.join(os.path.dirname(__file__), "..",
                           "defensegan_tpu", "configs", "gans", "mnist.yml")
    out = str(tmp_path / "run")
    train.main(["--cfg", cfg_yml, "--output_dir", out, "--is_train",
                "--train_iters", "10",
                "--override", "GEN_DIM=8", "--override", "DISC_DIM=8",
                "--override", "LATENT_DIM=16", "--override", "DISC_ITERS=1",
                "--override", "COMPUTE_DTYPE=float32",
                "--override", "SAMPLE_EVERY=10",
                "--override", "SAVE_EVERY=10",
                "--rec_rr", "2", "--rec_iters", "5", "--batch_size", "8"])
    common = ["--cfg", out, "--defense_type", "defense_gan", "--model",
              "E", "--num_tests", "8", "--classifier_epochs", "1",
              "--rec_rr", "2", "--rec_iters", "5",
              "--results_dir", str(tmp_path / "results")]
    whitebox.main(common + [
        "--attack_type", "fgsm", "--attack_rec_iters", "3",
        "--save_adv", str(tmp_path / "adv.npz")])
    rec = whitebox.main(common + [
        "--attack_type", "none", "--load_adv", str(tmp_path / "adv.npz"),
        "--detect", "--detect_passes", "3",
        "--detect_save", str(tmp_path / "stats.npz")])
    assert rec["attack"] == "fgsm_replay"
    assert rec["detect_passes"] == 3
    assert rec["attack_time_s"] == 0.0
    assert rec["adv_meta"]["attack"] == "fgsm"
    stats = np.load(tmp_path / "stats.npz", allow_pickle=False)
    assert stats["errs_clean_pp"].shape == (3, 8)
    assert stats["margins_adv_pp"].shape == (3, 8)
    np.testing.assert_allclose(stats["errs_clean_pp"].mean(0),
                               stats["errs_clean"], rtol=1e-12)
    meta = json.loads(str(stats["meta"]))
    assert meta["attack"] == "fgsm" and meta["detect_passes"] == 3
