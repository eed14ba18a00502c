"""Attack detection by reconstruction error (eval/detect.py; paper
section 5.1 — the public repo ships no detection CLI, so these tests are
the spec: exact rank-based AUC, threshold sweep, batched/padded score
extraction through gan.reconstruct, and the whitebox --detect wiring)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.eval import (reconstruction_errors, roc_auc,  # noqa: E402
                                 roc_points, tpr_at_fpr, two_sided_scores,
                                 undetected_success_rate)
from defensegan_tpu.gan import DefenseGAN  # noqa: E402


# ------------------------------------------------------------- ROC math
def test_roc_auc_separated_and_chance():
    rng = np.random.RandomState(0)
    neg = rng.rand(200)
    assert roc_auc(neg, neg + 10.0) == 1.0          # perfect separation
    assert roc_auc(neg + 10.0, neg) == 0.0          # inverted
    same = rng.rand(500)
    assert abs(roc_auc(same, same) - 0.5) < 1e-12   # identical => chance


def test_roc_auc_matches_pairwise_definition():
    """AUC == P(pos > neg) + 0.5 P(tie), computed by brute force."""
    rng = np.random.RandomState(1)
    neg = np.round(rng.rand(40), 1)   # coarse values force ties
    pos = np.round(rng.rand(30) + 0.2, 1)
    brute = np.mean((pos[:, None] > neg[None, :])
                    + 0.5 * (pos[:, None] == neg[None, :]))
    assert abs(roc_auc(neg, pos) - brute) < 1e-12


def test_roc_auc_rejects_empty():
    with pytest.raises(ValueError):
        roc_auc(np.array([]), np.array([1.0]))


def test_roc_points_and_tpr_at_fpr():
    neg = np.array([0.0, 0.1, 0.2, 0.3])
    pos = np.array([0.25, 0.4, 0.5, 0.6])
    fpr, tpr, thr = roc_points(neg, pos)
    assert fpr.shape == tpr.shape == thr.shape
    assert (np.diff(fpr) >= 0).all()  # monotone as threshold drops
    assert (np.diff(tpr) >= 0).all()
    rate, threshold = tpr_at_fpr(neg, pos, max_fpr=0.0)
    assert rate == 0.75  # 3 of 4 positives above the max negative (0.3)
    assert threshold == 0.3
    # degenerate: all scores tie => nothing detectable at fpr 0
    rate0, _ = tpr_at_fpr(np.array([1.0]), np.array([1.0]), max_fpr=0.0)
    assert rate0 == 0.0


def test_two_sided_catches_low_tail():
    """A rec-penalty attack pushes errors BELOW clean: one-sided AUC
    collapses to ~0 while the two-sided statistic stays near-perfect."""
    rng = np.random.RandomState(2)
    clean = 0.03 + 0.005 * rng.randn(300)
    adv_low = np.full(100, 0.0003)  # queue-S flagship regime
    assert roc_auc(clean, adv_low) < 0.05
    s_clean = two_sided_scores(clean, clean)
    s_adv = two_sided_scores(adv_low, clean)
    assert roc_auc(s_clean, s_adv) > 0.95


def test_two_sided_preserves_high_tail():
    rng = np.random.RandomState(3)
    clean = 0.03 + 0.005 * rng.randn(300)
    adv_high = 0.12 + 0.01 * rng.randn(100)
    s_clean = two_sided_scores(clean, clean)
    s_adv = two_sided_scores(adv_high, clean)
    assert roc_auc(s_clean, s_adv) > 0.99


def test_undetected_success_rate_joint_logic():
    clean = np.linspace(0.0, 1.0, 100)  # 5% FPR threshold = 0.95
    adv = np.array([0.99, 0.99, 0.5, 0.5])     # detected, detected, no, no
    mis = np.array([True, False, True, False])  # success, -, success, -
    rate, thr = undetected_success_rate(clean, adv, mis, max_fpr=0.05)
    # only adv[2] is both misclassified and under the threshold
    assert rate == 0.25
    assert 0.9 <= thr <= 1.0
    # every success detected => joint rate 0 even though accuracy is 50%
    rate0, _ = undetected_success_rate(clean, np.array([0.99, 0.5]),
                                       np.array([True, False]))
    assert rate0 == 0.0
    with pytest.raises(ValueError):
        undetected_success_rate(clean, adv, mis[:2])


def test_model_eval_gan_return_correct():
    from defensegan_tpu.eval import model_eval_gan

    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=2)
    gan = DefenseGAN(cfg)
    x = np.asarray(jax.random.uniform(jax.random.key(8), (5, 28, 28, 1)))
    y = np.array([0, 1, 0, 1, 0])
    logits_fn = lambda xb: jnp.stack(  # noqa: E731  predict class 0 always
        [jnp.ones(xb.shape[0]), jnp.zeros(xb.shape[0])], -1)
    acc, correct = model_eval_gan(gan, logits_fn, x, y, batch_size=4,
                                  key=jax.random.key(9),
                                  return_correct=True)
    assert correct.shape == (5,) and correct.dtype == bool
    assert np.array_equal(correct, y == 0)  # padding excluded
    assert acc == correct.mean() == 0.6
    # default path still returns the bare float
    acc2 = model_eval_gan(gan, logits_fn, x, y, batch_size=4,
                          key=jax.random.key(9))
    assert acc2 == acc


def test_eval_and_detector_share_key_sequence():
    """model_eval_gan and reconstruction_errors ride the same
    batched_reconstruct loop: same base key + batch size => identical
    per-batch restart keys (the paired clean/adv detection methodology
    and the eval-vs-detect comparability depend on this)."""
    from defensegan_tpu.eval import model_eval_gan

    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=2)
    gan = DefenseGAN(cfg)
    seen = []
    orig = gan.reconstruct

    def recording(xb, k, **kw):
        seen.append(np.asarray(jax.random.key_data(k)).tolist())
        return orig(xb, k, **kw)

    gan.reconstruct = recording
    x = np.asarray(jax.random.uniform(jax.random.key(12), (6, 28, 28, 1)))
    y = np.zeros(6, np.int32)
    logits_fn = lambda xb: jnp.zeros((xb.shape[0], 2))  # noqa: E731
    model_eval_gan(gan, logits_fn, x, y, key=jax.random.key(13),
                   batch_size=4)
    keys_eval, seen[:] = list(seen), []
    reconstruction_errors(gan, x, key=jax.random.key(13), batch_size=4)
    keys_det = list(seen)
    assert keys_eval == keys_det and len(keys_eval) == 2


# ----------------------------------------------------- score extraction
def test_reconstruction_errors_batching_and_signal():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=5)
    gan = DefenseGAN(cfg)
    key = jax.random.key(3)
    # "clean" = images the random generator CAN produce; "adversarial" =
    # uniform noise far from its manifold
    x_on = np.asarray(gan.generate(jax.random.key(4), 6))
    x_off = np.asarray(jax.random.uniform(jax.random.key(5),
                                          (6, 28, 28, 1)))
    # batch_size 4 over 6 images exercises the padded last batch
    e_on = reconstruction_errors(gan, x_on, key=key, batch_size=4)
    e_off = reconstruction_errors(gan, x_off, key=key, batch_size=4)
    assert e_on.shape == e_off.shape == (6,)
    assert np.isfinite(e_on).all() and np.isfinite(e_off).all()
    # on-manifold images must reconstruct strictly better on average,
    # and the detector must separate the two sets well above chance
    assert e_on.mean() < e_off.mean()
    assert roc_auc(e_on, e_off) >= 0.8


def test_reconstruction_errors_full_batch_single_call():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=3)
    gan = DefenseGAN(cfg)
    x = np.asarray(jax.random.uniform(jax.random.key(6), (4, 28, 28, 1)))
    e1 = reconstruction_errors(gan, x, key=jax.random.key(7), batch_size=4)
    e2 = reconstruction_errors(gan, x, key=jax.random.key(7), batch_size=4)
    assert np.array_equal(e1, e2)  # deterministic given the key


# ------------------------------------------------------- CLI validation
def test_whitebox_detect_requires_attack():
    from defensegan_tpu.cli import whitebox

    with pytest.raises(SystemExit) as ex:
        whitebox.main(["--attack_type", "none", "--defense_type", "none",
                       "--detect"])
    assert ex.value.code == 2


def test_blackbox_detect_requires_defense_gan():
    from defensegan_tpu.cli import blackbox

    with pytest.raises(SystemExit) as ex:
        blackbox.main(["--defense_type", "none", "--detect"])
    assert ex.value.code == 2


def test_bootstrap_auc_ci_brackets_point_estimate():
    from defensegan_tpu.eval import bootstrap_auc_ci

    rng = np.random.default_rng(0)
    neg = rng.normal(0.0, 1.0, 200)
    pos = rng.normal(1.5, 1.0, 200)
    auc = roc_auc(neg, pos)
    lo, hi = bootstrap_auc_ci(neg, pos, n_boot=300)
    assert lo <= auc <= hi
    assert 0.0 < hi - lo < 0.2          # informative, not vacuous
    # perfect separation: CI collapses at 1.0
    lo, hi = bootstrap_auc_ci([0.0, 0.1], [5.0, 6.0], n_boot=100)
    assert lo == hi == 1.0


def test_calibration_sweep_realized_fpr_converges():
    from defensegan_tpu.eval import calibration_sweep

    rng = np.random.default_rng(1)
    clean = rng.normal(1.0, 0.1, 2000)
    adv = rng.normal(3.0, 0.1, 500)      # far tail: TPR ~1 at any threshold
    rows = calibration_sweep(clean, adv, detector="two_sided", fpr=0.05,
                             sizes=(16, 256), trials=100, seed=0)
    small, big = rows
    assert big["tpr_mean"] > 0.99
    # a larger calibration set places the quantile closer to the target
    # and with less spread
    assert abs(big["fpr_mean"] - 0.05) <= abs(small["fpr_mean"] - 0.05) + 0.01
    assert big["fpr_p90"] <= small["fpr_p90"] + 0.01
    # one-sided variant runs and keeps the same row schema
    r1 = calibration_sweep(clean, adv, detector="one_sided", fpr=0.05,
                           sizes=(64,), trials=50)[0]
    assert r1["detector"] == "one_sided" and r1["tpr_mean"] > 0.99
    with pytest.raises(ValueError):
        calibration_sweep(clean[:10], adv, sizes=(16,))
    with pytest.raises(ValueError):
        calibration_sweep(clean, adv, detector="bogus", sizes=(16,))


# ------------------------------------------- two-feature detector math
def test_ecdf_atypicality_sides_and_ties():
    from defensegan_tpu.eval import ecdf_atypicality

    calib = np.array([1.0, 2.0, 3.0, 4.0])
    # midrank ECDF: u(2.5) = 0.5 -> perfectly typical both ways
    assert ecdf_atypicality([2.5], calib, "two_sided")[0] == 0.0
    # extremes: far above/below calib is maximally atypical two-sided
    assert ecdf_atypicality([100.0], calib, "two_sided")[0] == 1.0
    assert ecdf_atypicality([-100.0], calib, "two_sided")[0] == 1.0
    # low side: small margins suspicious, large ones typical
    low = ecdf_atypicality([-100.0, 100.0], calib, "low")
    assert low[0] == 1.0 and low[1] == 0.0
    high = ecdf_atypicality([-100.0, 100.0], calib, "high")
    assert high[0] == 0.0 and high[1] == 1.0
    # ties get half mass: value == a calib point uses midrank
    u_tied = ecdf_atypicality([2.0], calib, "high")[0]
    assert 0.25 <= u_tied <= 0.5
    with pytest.raises(ValueError):
        ecdf_atypicality([1.0], calib, "sideways")


def test_ecdf_atypicality_realizes_fpr_on_clean():
    """Thresholding the two-sided score at quantile(1-fpr) of the
    calibration's OWN scores flags ~fpr of a fresh clean sample —
    the distribution-free calibration property the combiner rests on."""
    from defensegan_tpu.eval import ecdf_atypicality

    rng = np.random.default_rng(0)
    calib = rng.normal(size=2000)
    fresh = rng.normal(size=2000)
    s_cal = ecdf_atypicality(calib, calib, "two_sided")
    s_new = ecdf_atypicality(fresh, calib, "two_sided")
    thr = np.quantile(s_cal, 0.95)
    assert abs((s_new > thr).mean() - 0.05) < 0.02


def test_combined_scores_catch_low_margin_near_manifold():
    """The CW regime: rec errors indistinguishable from clean (two-sided
    detector blind) but purified margins atypically LOW — the combined
    max-of-atypicalities statistic must separate what rec-err alone
    cannot."""
    from defensegan_tpu.eval import combined_scores, roc_auc

    rng = np.random.default_rng(1)
    errs_clean = rng.normal(0.03, 0.005, 512)
    margins_clean = rng.normal(5.0, 1.0, 512)
    errs_adv = rng.normal(0.03, 0.005, 512)        # same distribution
    margins_adv = rng.normal(0.5, 0.3, 512)        # barely-flipped
    s_clean = combined_scores(errs_clean, margins_clean,
                              errs_clean, margins_clean)
    s_adv = combined_scores(errs_adv, margins_adv,
                            errs_clean, margins_clean)
    auc_rec_only = roc_auc(np.abs(errs_clean - np.median(errs_clean)),
                           np.abs(errs_adv - np.median(errs_clean)))
    auc_comb = roc_auc(s_clean, s_adv)
    assert auc_rec_only < 0.6      # rec-err blind by construction
    assert auc_comb > 0.95         # margin feature carries the signal


def test_detection_features_matches_reconstruction_errors():
    """detection_features' rec-err leg must be bit-identical to
    reconstruction_errors (same batched_reconstruct loop + keys), and
    the margin leg must equal top1-top2 of the purified logits."""
    from defensegan_tpu.eval import detection_features

    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=3)
    gan = DefenseGAN(cfg)
    x = np.asarray(jax.random.uniform(jax.random.key(21), (6, 28, 28, 1)))

    def logits_fn(xb):
        m = jnp.mean(xb, axis=(1, 2, 3))
        return jnp.stack([1.0 - m, m, jnp.zeros_like(m)], -1)

    errs_ref = reconstruction_errors(gan, x, key=jax.random.key(22),
                                     batch_size=4)
    feats = detection_features(gan, x, logits_fn, key=jax.random.key(22),
                               batch_size=4)
    errs, margins, all_losses = feats.errs, feats.margins, feats.all_losses
    np.testing.assert_array_equal(errs, errs_ref)
    assert errs.shape == margins.shape == (6,)
    assert (margins >= 0).all()  # top1 - top2 is nonnegative
    # per-restart losses ride along: [N, R], best restart == errs
    assert all_losses.shape == (6, 2)
    np.testing.assert_allclose(all_losses.min(axis=1), errs, rtol=1e-6)
    # purified predictions ride along too (K-pass vote raw material):
    # argmax of the purified logits, consistent with a nonneg margin
    assert feats.preds.shape == (6,) and feats.preds.dtype == np.int32
    assert set(np.unique(feats.preds)) <= {0, 1, 2}


def test_calibration_sweep_combined_detector():
    """combined sweep: needs paired margins, realizes ~fpr on held-out
    clean, and detects the low-margin near-manifold regime that the
    two-sided rec-err sweep misses entirely."""
    from defensegan_tpu.eval import calibration_sweep

    rng = np.random.default_rng(2)
    errs_clean = rng.normal(0.03, 0.005, 600)
    margins_clean = rng.normal(5.0, 1.0, 600)
    errs_adv = rng.normal(0.03, 0.005, 300)       # rec-err blind
    margins_adv = rng.normal(0.5, 0.3, 300)       # low-margin signature

    with pytest.raises(ValueError):
        calibration_sweep(errs_clean, errs_adv, detector="combined")
    with pytest.raises(ValueError):
        calibration_sweep(errs_clean, errs_adv, detector="combined",
                          margins_clean=margins_clean[:10],
                          margins_adv=margins_adv)

    rows = calibration_sweep(errs_clean, errs_adv, detector="combined",
                             fpr=0.05, sizes=(64, 256), trials=50,
                             margins_clean=margins_clean,
                             margins_adv=margins_adv)
    rows_2s = calibration_sweep(errs_clean, errs_adv,
                                detector="two_sided", fpr=0.05,
                                sizes=(64, 256), trials=50)
    big = rows[-1]
    assert abs(big["fpr_mean"] - 0.05) < 0.03
    assert big["tpr_mean"] > 0.9           # margin feature carries it
    assert rows_2s[-1]["tpr_mean"] < 0.2   # rec-err alone blind


def test_restart_dispersion_kinds_and_validation():
    from defensegan_tpu.eval import restart_dispersion

    al = np.array([[1.0, 3.0, 2.0],
                   [2.0, 2.0, 2.0]])
    rg = restart_dispersion(al, "rel_gap")
    np.testing.assert_allclose(rg, [(2.0 - 1.0) / 1.0, 0.0])
    rs = restart_dispersion(al, "rel_spread")
    np.testing.assert_allclose(rs, [2.0, 0.0])
    cv = restart_dispersion(al, "cv")
    np.testing.assert_allclose(cv[1], 0.0)
    assert cv[0] > 0
    with pytest.raises(ValueError):
        restart_dispersion(al[0], "rel_gap")     # needs [N, R]
    with pytest.raises(ValueError):
        restart_dispersion(al, "nope")


def test_multi_feature_scores_generalizes_combined():
    """combined_scores must be exactly the 2-feature special case, and
    a 3rd uninformative feature must never LOWER any example's score
    (max composition)."""
    from defensegan_tpu.eval import combined_scores, multi_feature_scores

    rng = np.random.default_rng(5)
    errs_c = rng.normal(0.03, 0.005, 200)
    marg_c = rng.normal(5.0, 1.0, 200)
    errs_a = rng.normal(0.05, 0.005, 100)
    marg_a = rng.normal(0.5, 0.3, 100)
    two = combined_scores(errs_a, marg_a, errs_c, marg_c)
    two_mf = multi_feature_scores([(errs_a, errs_c, "two_sided"),
                                   (marg_a, marg_c, "low")])
    np.testing.assert_array_equal(two, two_mf)
    disp_c = rng.normal(1.0, 0.2, 200)
    disp_a = rng.normal(1.0, 0.2, 100)     # uninformative third feature
    three = multi_feature_scores([(errs_a, errs_c, "two_sided"),
                                  (marg_a, marg_c, "low"),
                                  (disp_a, disp_c, "two_sided")])
    assert (three >= two).all()


def test_dispersion_catches_centered_winner_with_sculpted_basins():
    """The third-feature premise: an attacker centers the WINNING loss
    on the clean median but collapses/skews the losing basins; the
    2-feature detector (err typical, margin high) misses it, the
    dispersion feature flags it."""
    from defensegan_tpu.eval import (multi_feature_scores,
                                     restart_dispersion, roc_auc)

    rng = np.random.default_rng(7)
    n, r = 300, 10
    # clean: winner ~0.03, losers spread well above it
    clean_win = rng.normal(0.03, 0.003, (n, 1))
    clean_rest = clean_win + np.abs(rng.normal(0.02, 0.008, (n, r - 1)))
    al_clean = np.concatenate([clean_win, clean_rest], 1)
    # adversarial: winner ON the clean median, basins collapsed tight
    adv_win = np.full((n, 1), 0.03)
    adv_rest = adv_win + np.abs(rng.normal(0.001, 0.0005, (n, r - 1)))
    al_adv = np.concatenate([adv_win, adv_rest], 1)
    errs_c, errs_a = al_clean.min(1), al_adv.min(1)
    marg_c = rng.normal(5.0, 1.0, n)
    marg_a = rng.normal(5.0, 1.0, n)       # confidently-wrong: margin typical

    two_c = multi_feature_scores([(errs_c, errs_c, "two_sided"),
                                  (marg_c, marg_c, "low")])
    two_a = multi_feature_scores([(errs_a, errs_c, "two_sided"),
                                  (marg_a, marg_c, "low")])
    assert roc_auc(two_c, two_a) < 0.65    # 2f is (near) blind here
    d_c = restart_dispersion(al_clean, "rel_gap")
    d_a = restart_dispersion(al_adv, "rel_gap")
    three_c = multi_feature_scores([(errs_c, errs_c, "two_sided"),
                                    (marg_c, marg_c, "low"),
                                    (d_c, d_c, "two_sided")])
    three_a = multi_feature_scores([(errs_a, errs_c, "two_sided"),
                                    (marg_a, marg_c, "low"),
                                    (d_a, d_c, "two_sided")])
    assert roc_auc(three_c, three_a) > 0.95


def test_kpass_analysis_script_sweep(tmp_path):
    """scripts/kpass_analysis.py: K-averaging must monotonically help on
    data built to match its model (attacker moved the MEANS onto clean,
    per-pass noise is what separates) and the K'=K row is deterministic."""
    import json

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import kpass_analysis

    rng = np.random.default_rng(3)
    k, n = 6, 200
    # rec errs: adv mean sits ON clean mean (centered attack) but adv
    # margins are shifted; per-pass noise makes K=1 weak, K=6 strong
    ec = 0.033 + 0.004 * rng.standard_normal((k, n))
    ea = 0.033 + 0.004 * rng.standard_normal((k, n))
    mc = 30.0 + 8.0 * rng.standard_normal((k, n))
    ma = 24.0 + 8.0 * rng.standard_normal((k, n))
    npz = tmp_path / "fake_k6.npz"
    np.savez(npz, meta=json.dumps({"dataset": "fake", "attack": "spsa",
                                   "detect_passes": k}),
             errs_clean=ec.mean(0), errs_adv=ea.mean(0),
             margins_clean=mc.mean(0), margins_adv=ma.mean(0),
             errs_clean_pp=ec, errs_adv_pp=ea,
             margins_clean_pp=mc, margins_adv_pp=ma,
             defended_correct_adv=rng.random(n) > 0.8)
    out = tmp_path / "rows.jsonl"
    kpass_analysis.main(["--npz", str(npz), "--subsets", "8",
                         "--out", str(out)])
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert [r["k"] for r in rows] == list(range(1, k + 1))
    # margin detector: K=6 average must beat K=1 (the variance lever)
    assert rows[-1]["margin"]["auc"] > rows[0]["margin"]["auc"] + 0.05
    # joint leak shrinks (or stays) with K for the combined detector
    assert (rows[-1]["combined"]["joint_undetected"]
            <= rows[0]["combined"]["joint_undetected"] + 1e-9)
    # K'=K is the deterministic full average: one subset, zero spread
    assert rows[-1]["n_subsets"] == 1
    assert rows[-1]["margin"]["auc_sd"] == 0.0
    # npz without per-pass arrays is skipped without error
    npz2 = tmp_path / "plain.npz"
    np.savez(npz2, meta=json.dumps({"dataset": "fake", "attack": "cw"}),
             errs_clean=ec.mean(0), errs_adv=ea.mean(0))
    kpass_analysis.main(["--npz", str(npz2)])


def test_kpass_analysis_vote(tmp_path):
    """--vote: majority voting must lift defended accuracy on data built
    so adversarial successes FLIP across keys (wrong with prob 0.45 per
    pass, independently) while clean predictions are stable; vote
    disagreement must separate adv from clean; K=1 voting reproduces
    the single-pass accuracy; ties break toward the subset's first pass."""
    import json

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import kpass_analysis

    # tie-break unit check: 2 passes disagree -> vote follows pass 0
    P = np.array([[1, 2], [0, 1]])
    vote, dis = kpass_analysis._majority_vote(P)
    np.testing.assert_array_equal(vote, [1, 2])
    np.testing.assert_allclose(dis, [0.5, 0.5])

    rng = np.random.default_rng(7)
    k, n = 8, 240
    y = rng.integers(0, 10, n).astype(np.int32)
    # clean: always right. adv: per-pass wrong with prob 0.45 (unstable
    # success) -> majority vote mostly recovers the true class
    pc = np.tile(y, (k, 1))
    flip = rng.random((k, n)) < 0.45
    pa = np.where(flip, (y + 1) % 10, y)
    ec = 0.033 + 0.004 * rng.standard_normal((k, n))
    ea = 0.033 + 0.004 * rng.standard_normal((k, n))
    mc = 30.0 + 8.0 * rng.standard_normal((k, n))
    ma = 30.0 + 8.0 * rng.standard_normal((k, n))
    npz = tmp_path / "fake_vote_k8.npz"
    np.savez(npz, meta=json.dumps({"dataset": "fake", "attack": "spsa",
                                   "detect_passes": k}),
             errs_clean=ec.mean(0), errs_adv=ea.mean(0),
             margins_clean=mc.mean(0), margins_adv=ma.mean(0),
             errs_clean_pp=ec, errs_adv_pp=ea,
             margins_clean_pp=mc, margins_adv_pp=ma,
             preds_clean_pp=pc, preds_adv_pp=pa, y=y,
             defended_correct_adv=(pa[0] == y))
    out = tmp_path / "vote_rows.jsonl"
    kpass_analysis.analyze_vote(str(npz), 0.05, 8, str(out))
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert [r["k"] for r in rows] == list(range(1, k + 1))
    # K=1 vote accuracy == single-pass accuracy in expectation (~0.55)
    assert abs(rows[0]["vote_defended_acc"] - 0.55) < 0.1
    # K=8 majority vote recovers flips: P(wrong) = P(X>=5) +
    # 0.45*P(X=4 tie->pass0), X~Bin(8,0.45) -> acc ~0.62 vs 0.55 at K=1
    assert rows[-1]["vote_defended_acc"] > rows[0]["vote_defended_acc"] + 0.05
    # disagreement separates: clean never disagrees, adv flips
    assert rows[-1]["disagree_auc"] > 0.9
    # npz without preds is skipped without error
    npz2 = tmp_path / "nopreds.npz"
    np.savez(npz2, meta=json.dumps({"dataset": "fake", "attack": "cw"}),
             errs_clean_pp=ec, errs_adv_pp=ea,
             margins_clean_pp=mc, margins_adv_pp=ma)
    kpass_analysis.analyze_vote(str(npz2), 0.05, 8, None)
