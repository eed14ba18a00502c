#!/usr/bin/env python
"""Round-5 chip queue — one data-driven LEGS table (queue_lib.run_spec).

The round's security question (VERDICT round-4 item 2): the two-feature
detector (rec err + purified top1-top2 margin, eval/detect.py) is now
the load-bearing defense claim — the centered SPSA broke the rec-err
layers outright (flagship: defended 0.039, two-sided AUC 0.136, joint
undetected 96.1%; combined restored AUC 1.000 / joint 0.000). The
textbook counter to the margin feature is a "confidently wrong"
objective, and SPSA can optimize it forward-only. whitebox now ships it:
--spsa_objective confident --spsa_margin_kappa K maximizes

    conf_margin(x) - K - lam * |rec_err(x) - C|

where conf_margin is z_w - max_{j!=w} z_j (positive iff misclassified,
and then EQUAL to the detector's margin statistic on the purified
image). kappa = the clean purified-margin MEDIAN (the well-informed
attacker's aim point): flagship 31.65, digits 9.67 (committed detstats
flagship_spsa_l300.npz / digits_cw_2f.npz). Centers = clean rec-err
medians (flagship 0.033, digits 0.0017 — queue-V/round-4 values).

Pre-registered predictions:
  - conf_flagship_*: if the combined detector is breakable, this is the
    attack that breaks it; joint undetected >> 0 means the round must
    promote a third feature (restart dispersion — all_losses now saved
    by --detect_save).
  - The attacker faces a real tension: pushing the WRONG class margin
    above the clean median through a purifier that reconstructs the
    TRUE class is much harder than barely flipping the decision, and
    every probe pays the full projection. Partial success (margin up,
    success rate down) is itself a defense result — quantify it.

Also in this queue (VERDICT items 3, 5, 6):
  - equal-budget digits SPSA (80x64 — round-4 ran digits at 40x32, which
    understated the attack) incl. the lam=6000 centered leg the round-4
    queue armed but never ran;
  - f-mnist + celeba_wide SPSA cells with detection stats (grid parity);
  - CW-on-digits re-run saving the NEW detstats layout (all_losses
    [N,R] per-restart finals) for the restart-dispersion feature
    analysis;
  - pipeline_exp recalibration rows: --calib_source test_tail (the
    round-4 23.4%-clean-flag-rate diagnosis) vs the old train_tail rows,
    combined + two_sided, digits + flagship.

Run: python scripts/round5_queue.py [only_leg ...]   (cwd=/root/repo)
Explicit leg names ignore .done markers (shared namespace
output/round3_queue/ — r5_ prefix keeps them distinct).
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import queue_lib  # noqa: E402


def _script(path, argv=()):
    queue_lib.run_script(path, list(argv))


RUNNERS = {"script": _script}

# flagship attack budget (matches the round-4 capstone cell exactly so
# rows are comparable): 128 tests, 80 iters x 64 samples, chunk 8
FLAGSHIP_SPSA = ["--cfg", "output/gans/mnist_fast", "--model", "A",
                 "--attack_type", "spsa", "--num_tests", "128",
                 "--attack_batch", "64", "--spsa_iters", "80",
                 "--spsa_samples", "64", "--spsa_chunk", "8", "--detect"]
DIGITS_SPSA = ["--cfg", "output/gans/digits", "--model", "A",
               "--attack_type", "spsa", "--num_tests", "128",
               "--attack_batch", "64", "--spsa_iters", "80",
               "--spsa_samples", "64", "--spsa_chunk", "8", "--detect"]

LEGS = [
    # -- insurance first: a live-chip run of the redesigned bench
    # (supervisor/worker, incremental records) so the driver's
    # end-of-round BENCH_r05 capture has a warm compile cache behind it.
    {"name": "r5_bench", "run": "script", "path": "bench.py"},

    # -- the counter-attack to the detector of record ------------------
    {"name": "r5_conf_flagship_l300", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "31.65",
         "--spsa_rec_penalty", "300", "--spsa_rec_center", "0.033",
         "--save_adv", "output/advsets/flagship_conf_l300.npz",
         "--detect_save", "output/detstats/flagship_conf_l300.npz"]},
    {"name": "r5_conf_flagship_l30", "run": "script", "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "31.65",
         "--spsa_rec_penalty", "30", "--spsa_rec_center", "0.033",
         "--detect_save", "output/detstats/flagship_conf_l30.npz"]},
    # softer aim point: kappa at the clean 10th percentile — the
    # attacker only needs OUT of the detector's 5% low tail, not to the
    # median; if this leg leaks more than kappa=median, the frontier
    # bends where theory says it should
    {"name": "r5_conf_flagship_k25_l300", "run": "script",
     "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "25.56",
         "--spsa_rec_penalty", "300", "--spsa_rec_center", "0.033",
         "--detect_save", "output/detstats/flagship_conf_k25_l300.npz"]},

    # -- equal-budget digits grid (VERDICT 6) + its confident counter --
    {"name": "r5_spsa_digits_eq", "run": "script", "path": "whitebox.py",
     "argv": DIGITS_SPSA},
    {"name": "r5_spsa_da_digits_l6000_eq", "run": "script",
     "path": "whitebox.py",
     "argv": DIGITS_SPSA + [
         "--spsa_rec_penalty", "6000", "--spsa_rec_center", "0.0017",
         "--detect_save", "output/detstats/digits_spsa_l6000_eq.npz"]},
    {"name": "r5_conf_digits_l6000", "run": "script", "path": "whitebox.py",
     "argv": DIGITS_SPSA + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "9.67",
         "--spsa_rec_penalty", "6000", "--spsa_rec_center", "0.0017",
         "--save_adv", "output/advsets/digits_conf_l6000.npz",
         "--detect_save", "output/detstats/digits_conf_l6000.npz"]},

    # -- grid parity: SPSA cells on the remaining trained targets ------
    {"name": "r5_spsa_fmnist", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/f-mnist", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8", "--detect",
              "--detect_save", "output/detstats/fmnist_spsa.npz"]},
    {"name": "r5_spsa_celeba_wide", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/celeba_wide", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "64",
              "--attack_batch", "32", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8", "--detect",
              "--detect_save", "output/detstats/celeba_wide_spsa.npz"]},

    # -- CW-on-digits with the new detstats layout (all_losses [N,R])
    # for the restart-dispersion third-feature analysis (VERDICT 5)
    {"name": "r5_cw_digits_3f", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "cw", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "200",
              "--attack_batch", "128", "--cw_max_iterations", "200",
              "--cw_binary_search_steps", "4", "--cw_abort_early",
              "--cw_chunk_iters", "25", "--detect",
              "--detect_save", "output/detstats/digits_cw_3f.npz"]},

    # -- serving recalibration (VERDICT 3): test-distribution calibration
    # vs the round-4 train-tail rows, both detectors, digits + flagship
    {"name": "r5_pipe_digits_comb_testcal", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--detector", "combined", "--calib_source", "test_tail",
              "--sets", "output/advsets/digits_fgsm.npz",
              "output/advsets/digits_cw.npz",
              "output/advsets/digits_pgd.npz",
              "output/advsets/digits_pgd_pen30.npz",
              "output/advsets/digits_pgd_cen.npz"]},
    {"name": "r5_pipe_digits_2s_testcal", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--detector", "two_sided", "--calib_source", "test_tail",
              "--sets", "output/advsets/digits_cw.npz"]},
    {"name": "r5_pipe_flagship_comb_testcal", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--detector", "combined", "--calib_source", "test_tail",
              "--sets", "output/advsets/flagship_spsa_l300.npz"]},
    # the confident advset through the serving surface (depends on
    # r5_conf_flagship_l300 having saved it; queue order guarantees that)
    {"name": "r5_pipe_flagship_conf", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--detector", "combined", "--calib_source", "test_tail",
              "--sets", "output/advsets/flagship_conf_l300.npz"]},

    # -- K-pass detection (added after the first conf legs measured):
    # the confident+centered SPSA reduced the 2-feature detector to
    # 22.7% joint leak (AUC 0.927) and the dispersion feature is blind
    # to it (AUC ~0.5) — the remaining defender lever is VARIANCE: the
    # attacker optimizes the EXPECTED statistics over keys, so
    # averaging K independent detection passes concentrates both
    # classes ~sqrt(K) around means the attack could only partially
    # move. Replay the saved advsets under K=8 (per-pass features
    # saved; offline subset-averaging gives the full K-sweep).
    {"name": "r5_kpass_conf_l300", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/flagship_conf_l300.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save",
              "output/detstats/flagship_conf_l300_k8.npz"]},
    # does K-pass also close the CW-on-digits ~5% leak (VERDICT 5)?
    {"name": "r5_kpass_digits_cw", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/digits_cw.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save", "output/detstats/digits_cw_k8.npz"]},
    {"name": "r5_kpass_digits_conf", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/digits_conf_l6000.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save",
              "output/detstats/digits_conf_l6000_k8.npz"]},

    # -- dev-split calibration (added after the test_tail legs measured):
    # digits' test tail is 41 images and the measured clean flag rate was
    # 26.6% at a 5% target — consistent with simulated small-n noise
    # (random-41: 7.6%±4.9%, max 28.8%) compounded by sklearn-digits'
    # writer-ordering structure. The dev split gives 200 held-out images
    # (simulated n=200 rate: 5.3%±3.3%). These legs measure the dev-
    # calibrated serving numbers for the full digits attack matrix.
    {"name": "r5_pipe_digits_comb_devcal", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--detector", "combined", "--calib_source", "dev",
              "--sets",
              "output/advsets/digits_cw.npz",
              "output/advsets/digits_conf_l6000.npz",
              "output/advsets/digits_fgsm.npz",
              "output/advsets/digits_pgd.npz",
              "output/advsets/digits_pgd_cen.npz"]},
    {"name": "r5_pipe_digits_2s_devcal", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--detector", "two_sided", "--calib_source", "dev",
              "--sets", "output/advsets/digits_cw.npz",
              "output/advsets/digits_conf_l6000.npz"]},

    # -- K-pass VOTE replays (added after feature-averaging null-resulted):
    # the same K=8 replays, re-run after DetectionFeatures gained purified
    # predictions — the saved preds_*_pp arrays feed kpass_analysis --vote
    # (majority-vote defended accuracy + vote-disagreement detection), the
    # question feature averaging can't answer: is the attack's SUCCESS
    # stable across projection keys?
    {"name": "r5_vote_conf_l300", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/flagship_conf_l300.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save",
              "output/detstats/flagship_conf_l300_k8.npz"]},
    {"name": "r5_vote_digits_cw", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/digits_cw.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save", "output/detstats/digits_cw_k8.npz"]},
    {"name": "r5_vote_digits_conf", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/digits_conf_l6000.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save",
              "output/detstats/digits_conf_l6000_k8.npz"]},

    # -- the vote-aware counter-attack (added after the K-pass vote legs
    # measured): digits CW is the ONE cell where the attack is
    # key-UNstable — majority vote across 8 keys recovers ~21% of its
    # residual errors (0.836 -> 0.871) and disagreement carries signal
    # (AUC 0.64). whitebox --attack_eot_keys 3 re-crafts CW against the
    # EXPECTED defended logits over 3 projection keys (EOT with the
    # restart lottery as the transformation; attacks/compose.py).
    # Pre-registered predictions: if EOT-CW succeeds AND its successes
    # become key-stable (vote recovery gone, disagree AUC -> 0.5), the
    # vote=True serving win is an artifact of a key-naive attacker and
    # TODO's "designed but not run" argument was wrong to wave it off;
    # if EOT-CW finds fewer/larger-L2 adversaries, the vote survives a
    # vote-aware attacker and the serving claim hardens. attack_batch 64
    # (vs 128 single-key) bounds the 3x-wider unrolled graph's memory.
    {"name": "r5_eotcw_digits", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "cw", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "200",
              "--attack_batch", "64", "--cw_max_iterations", "200",
              "--cw_binary_search_steps", "4", "--cw_abort_early",
              "--cw_chunk_iters", "25", "--attack_eot_keys", "3",
              "--detect",
              "--save_adv", "output/advsets/digits_cw_eot3.npz",
              "--detect_save", "output/detstats/digits_cw_eot3.npz"]},
    # the same 8-pass replay the single-key CW got: feeds
    # kpass_analysis --vote (vote acc + disagreement AUC vs the
    # single-key cell's 0.871 / 0.637)
    {"name": "r5_vote_digits_cw_eot", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "none",
              "--load_adv", "output/advsets/digits_cw_eot3.npz",
              "--detect", "--detect_passes", "8",
              "--detect_save", "output/detstats/digits_cw_eot3_k8.npz"]},
    # -- the dispersed-center counter to learned combiners (added after
    # scripts/learned_combiner_analysis.py measured the fixed-center
    # cells): an in-sample oracle LR separates the flagship confident
    # leak (joint 0.227 -> 0.055) by keying on the attack's rec-err
    # being SUSPICIOUSLY typical (u_err 0.537 +/- 0.04 vs clean's
    # uniform). --spsa_center_quantiles 0.05 0.95 disperses the
    # per-image center across the clean quantile range.
    # Pre-registered predictions:
    #   (1) vs the shipped max2f detector the leak is UNCHANGED
    #       (~0.22): dispersed centers never enter the 5% tails, so
    #       the err feature stays silent either way;
    #   (2) the fixed-center-trained oracle's win EVAPORATES on this
    #       set (joint back to >= margin-only ~0.14), because its
    #       dominant negative-s_err coefficient fires on clean-typical
    #       err scores the dispersed attack now shares;
    #   (3) a fresh in-sample oracle on THIS set lands at margin-only
    #       (~0.14) with |coef(s_err)| near 0 — i.e. after dispersion
    #       the rec-err feature carries no per-image information and
    #       the game-theoretic detector floor is the margin feature
    #       alone. (1)+(2)+(3) => the oracle's apparent improvement is
    #       an artifact of the attacker's fixed center, and the ~22%
    #       structural-leak conclusion survives learned combiners.
    {"name": "r5_conf_flagship_disp", "run": "script",
     "path": "whitebox.py",
     "argv": FLAGSHIP_SPSA + [
         "--spsa_objective", "confident", "--spsa_margin_kappa", "31.65",
         "--spsa_rec_penalty", "300",
         "--spsa_center_quantiles", "0.05", "0.95",
         "--save_adv", "output/advsets/flagship_conf_disp.npz",
         "--detect_save", "output/detstats/flagship_conf_disp.npz"]},
]

if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:],
                       label="round5 queue")
