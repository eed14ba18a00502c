"""White-box attack + defense evaluation CLI.

Reference parity: whitebox.py of kabkabm/defensegan (~L60-350):
  python whitebox.py --cfg <dir-or-yml> --attack_type {fgsm,rand_fgsm,cw}
      --defense_type {none,defense_gan,adv_tr} --model {A..F}
      [--num_tests N] [--train_on_recs] [--fgsm_eps 0.3]
      [--rec_iters/--rec_rr/--rec_lr overrides]

Pipeline (reference call stack, SURVEY.md section 3.3): load trained GAN ->
build/train classifier -> craft attack (through the differentiable
reconstruction when defending, back_prop=True) -> purify -> classify ->
report clean / adversarial / defended accuracies.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.attacks import (CWConfig, attack_batch_key,
                                    attack_z0_key, carlini_wagner_l2,
                                    effective_cw_chunk, eot_over_keys, fgsm,
                                    make_attack_target, make_chunked_cw,
                                    make_chunked_pgd, pgd, rand_fgsm,
                                    split_rand_fgsm_key)
from defensegan_tpu.cli.common import (add_cfg_args, cfg_from_args, limit,
                                       load_data, load_gan)
from defensegan_tpu.eval import model_eval, model_eval_gan, train_classifier
from defensegan_tpu.models import build_classifier
from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
from defensegan_tpu.utils.profiling import PhaseTimer


def get_classifier(cfg, args, gan, x_train, y_train, key):
    """Train (or load cached) classifier; reference trains per run unless a
    saved model exists. Supports --train_on_recs and adv_tr."""
    from defensegan_tpu.ckpt import save_checkpoint
    from defensegan_tpu.eval.classifier import load_cached_classifier

    model = build_classifier(args.model, num_classes=cfg.num_classes)
    tag = f"{cfg.type}_model{args.model}"
    if args.defense_type == "adv_tr":
        tag += f"_advtr{args.fgsm_eps}"
    if args.train_on_recs:
        tag += "_on_recs"
    clf_dir = os.path.join("output", "classifiers", tag)

    if not args.retrain_classifier:
        cached = load_cached_classifier(tag, model, cfg.image_shape)
        if cached is not None:
            print(f"loaded classifier {tag}")
            return cached

    x_fit, y_fit = x_train, y_train
    if args.train_on_recs:
        # reference: train the classifier on Defense-GAN reconstructions of
        # the training set (--train_on_recs / online training variant)
        n = min(args.num_rec_train, x_train.shape[0])
        print(f"reconstructing {n} training images for --train_on_recs ...")
        recs = []
        bs = 256
        for i in range(0, n, bs):
            xb = jnp.asarray(x_train[i:i + bs])
            res = gan.reconstruct(xb, jax.random.fold_in(key, i))
            recs.append(np.asarray(res.x_hat))
        x_fit = np.concatenate(recs)[:n]
        y_fit = y_train[:n]

    adv_eps = args.fgsm_eps if args.defense_type == "adv_tr" else None
    print(f"training classifier {tag} on {x_fit.shape[0]} images "
          f"({args.classifier_epochs} epochs"
          + (f", FGSM adv training eps={adv_eps}" if adv_eps else "") + ")")
    state = train_classifier(model, x_fit, y_fit, key=key,
                             epochs=args.classifier_epochs,
                             adv_eps=adv_eps, quiet=False)
    save_checkpoint(clf_dir, 0, state.params)
    return state


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_cfg_args(ap)
    ap.add_argument("--attack_type", default="fgsm",
                    choices=["fgsm", "rand_fgsm", "cw", "pgd", "spsa",
                             "none"],
                    help="fgsm/rand_fgsm/cw: the reference's attack suite; "
                    "pgd: beyond-reference (Madry et al.) — pair with "
                    "--attack_grad bpda for the Athalye et al. adaptive "
                    "attack on this defense; spsa: gradient-FREE (Uesato "
                    "et al. 2018) — attacks the real non-differentiable "
                    "inference path directly (no BPDA surrogate, fast "
                    "kernels included)")
    ap.add_argument("--defense_type", default="defense_gan",
                    choices=["none", "defense_gan", "adv_tr"])
    ap.add_argument("--model", default="A", help="classifier A..F")
    ap.add_argument("--num_tests", type=int, default=512)
    ap.add_argument("--fgsm_eps", type=float, default=0.3)
    ap.add_argument("--alpha", type=float, default=0.05,
                    help="RAND+FGSM random-step size")
    ap.add_argument("--cw_max_iterations", type=int, default=100)
    ap.add_argument("--cw_binary_search_steps", type=int, default=4)
    ap.add_argument("--cw_abort_early", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="cleverhans abort_early: stop a binary-search step "
                    "when the objective plateaus (checked at chunk "
                    "boundaries; implies the chunked driver)")
    ap.add_argument("--cw_chunk_iters", type=int, default=0,
                    help="split the CW inner loop into host-dispatched scan "
                    "chunks of this many iterations (0 = auto: chunk by 100 "
                    "when attacking THROUGH the defense, where one fused "
                    "program would run minutes and trip the TPU runtime "
                    "watchdog; -1 = never chunk)")
    ap.add_argument("--pgd_iters", type=int, default=40,
                    help="PGD steps (Madry et al. MNIST setting: 40)")
    ap.add_argument("--pgd_eps_iter", type=float, default=0.01,
                    help="PGD per-step size (Madry et al. MNIST: 0.01); "
                    "the ball radius is --fgsm_eps")
    ap.add_argument("--pgd_rand_init",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="uniform random start inside the eps ball")
    ap.add_argument("--pgd_z0", default="per_step",
                    choices=["per_step", "fixed"],
                    help="restart-init keys the through-defense PGD target "
                    "consumes: per_step (default) draws fresh z0 every "
                    "step — EOT-style, the right attack on the stochastic "
                    "defense; fixed pins one z0 draw for all steps, which "
                    "--eval_z0 both can then replay exactly")
    ap.add_argument("--pgd_rec_penalty", type=float, default=0.0,
                    help="DETECTION-AWARE adaptive attack: subtract this "
                    "times the projection loss (the --detect statistic) "
                    "from the PGD objective, so the attacker trades "
                    "classification damage for staying under the "
                    "rec-error detector (needs --attack_through_defense "
                    "yes + --defense_type defense_gan)")
    ap.add_argument("--pgd_rec_center", type=float, default=None,
                    metavar="C",
                    help="with --pgd_rec_penalty: penalize (rec_loss - C)^2 "
                    "instead of rec_loss — the attacker's counter to the "
                    "TWO-SIDED detector (steer the statistic TO the clean "
                    "median C rather than past it; the white-box attacker "
                    "knows the detector's calibration)")
    ap.add_argument("--pgd_chunk_iters", type=int, default=0,
                    help="split the PGD loop into host-dispatched scan "
                    "chunks of this many steps (0 = auto: chunk when "
                    "attacking THROUGH the defense so no device program "
                    "trips the TPU watchdog; -1 = never chunk)")
    ap.add_argument("--spsa_iters", type=int, default=40,
                    help="SPSA Adam steps (cleverhans SPSA lineage)")
    ap.add_argument("--spsa_samples", type=int, default=32,
                    help="Rademacher PAIRS per SPSA gradient estimate "
                    "(each pair = two defended forwards)")
    ap.add_argument("--spsa_delta", type=float, default=0.01,
                    help="SPSA finite-difference probe radius")
    ap.add_argument("--spsa_lr", type=float, default=0.01,
                    help="SPSA Adam learning rate on the perturbation")
    ap.add_argument("--spsa_chunk", type=int, default=8,
                    help="probe pairs per device dispatch; each dispatch "
                    "purifies spsa_chunk * attack_batch images per sign "
                    "(bigger = better kernel occupancy, more memory)")
    ap.add_argument("--spsa_rec_penalty", type=float, default=0.0,
                    metavar="LAMBDA",
                    help="detection-aware SPSA: subtract LAMBDA * rec_loss "
                    "from the margin objective, so the gradient-free "
                    "attacker optimizes the TRUE detector statistic (the "
                    "projection's own final loss) — no BPDA surrogate, "
                    "unlike --pgd_rec_penalty (requires "
                    "--attack_type spsa --attack_through_defense yes + "
                    "--defense_type defense_gan)")
    ap.add_argument("--spsa_rec_center", type=float, default=None,
                    metavar="C",
                    help="with --spsa_rec_penalty: penalize |rec_loss - C| "
                    "instead of rec_loss — the gradient-free counter to "
                    "the TWO-SIDED detector (steer the statistic TO the "
                    "clean median C); C is exactly the statistic the "
                    "detector thresholds, measured, not differentiated")
    ap.add_argument("--spsa_center_quantiles", type=float, nargs=2,
                    default=None, metavar=("LO", "HI"),
                    help="with --spsa_rec_penalty: per-image DISPERSED "
                    "centers C_i at clean rec-err quantiles u_i ~ U[LO, "
                    "HI] (measured from one clean reconstruction pass at "
                    "craft time) instead of one fixed --spsa_rec_center. "
                    "The counter to any detector keying on the rec-err "
                    "statistic being SUSPICIOUSLY typical — the fixed-"
                    "center attack concentrates at one clean quantile "
                    "(u std ~0.04 vs clean ~0.29, the signature the "
                    "oracle combiner exploits); dispersing spreads it "
                    "across the clean distribution at zero cost vs the "
                    "max combiner (mutually exclusive with "
                    "--spsa_rec_center)")
    ap.add_argument("--spsa_objective", default="margin",
                    choices=["margin", "confident"],
                    help="margin: max_{i!=y} z_i - z_y on the defended "
                    "logits (misclassify, the Uesato et al. objective); "
                    "confident: z_w - max_{j!=w} z_j with w the best "
                    "wrong class — the 'confidently wrong' counter to "
                    "the two-feature detector, whose margin feature "
                    "flags purified top1-top2 in the clean LOW tail; "
                    "positive iff misclassified, and then EQUAL to the "
                    "detector's own margin statistic (requires "
                    "--spsa_margin_kappa)")
    ap.add_argument("--spsa_margin_kappa", type=float, default=None,
                    metavar="KAPPA",
                    help="with --spsa_objective confident: the purified-"
                    "margin level the attacker aims above (the objective "
                    "becomes conf_margin - KAPPA - lambda*|rec - C|, so "
                    "freeze_on_success freezes only examples that are "
                    "misclassified CONFIDENTLY above KAPPA with a small "
                    "rec penalty — beating all detector features under "
                    "the attack's own keys). Set it to the clean purified-"
                    "margin median (the well-informed attacker's choice; "
                    "whitebox --detect prints clean margin stats)")
    ap.add_argument("--train_on_recs", action="store_true")
    ap.add_argument("--online_training", action="store_true",
                    help="alias kept for reference-CLI parity: train the "
                    "classifier on reconstructions (same as --train_on_recs)")
    ap.add_argument("--num_rec_train", type=int, default=1024)
    ap.add_argument("--classifier_epochs", type=int, default=10)
    ap.add_argument("--retrain_classifier", action="store_true")
    ap.add_argument("--attack_batch", type=int, default=64)
    ap.add_argument("--attack_rec_iters", type=int, default=None,
                    help="L used INSIDE the attack graph (defaults to "
                    "cfg.rec_iters; the paper attacks through the full "
                    "unrolled loop)")
    ap.add_argument("--attack_grad", default="exact",
                    choices=["exact", "bpda"],
                    help="gradient the through-defense attack uses: exact "
                    "(reference: differentiate the unrolled L-step "
                    "projection) or bpda (Athalye et al. 2018 "
                    "straight-through identity around the projection — "
                    "the canonical adaptive attack, ~L times cheaper to "
                    "craft; forward pass is still the real defense)")
    ap.add_argument("--attack_through_defense", default="yes",
                    choices=["yes", "no"],
                    help="yes: attacker differentiates through the unrolled "
                    "reconstruction (paper's strongest white-box); no: "
                    "attack crafted on the bare classifier, defense applied "
                    "only at eval (attacker unaware of the defense)")
    ap.add_argument("--attack_eot_keys", type=int, default=1,
                    help="differentiate through the MEAN defended logits "
                    "over K independent projection keys (EOT with the "
                    "restart lottery as the transformation, Athalye et "
                    "al. 2018) — the counter-attack to K-pass vote "
                    "serving, which exploits key-UNstable attack "
                    "successes. Applies to the through-defense gradient "
                    "attacks (fgsm/rand_fgsm/pgd/cw); costs K x the "
                    "single-key graph per attack evaluation")
    ap.add_argument("--eval_z0", default="fresh",
                    choices=["fresh", "both"],
                    help="restart-init seeding for the DEFENDED eval. "
                    "fresh (default, the paper's deployment setting): "
                    "every eval batch draws new restart z0 — the defense "
                    "is stochastic w.r.t. the attacker. both: ALSO report "
                    "defended accuracy with the eval reusing the attack "
                    "graph's exact per-batch z0 (defended_acc_attack_z0 in "
                    "the record) — the difference isolates how much of the "
                    "defended accuracy is restart stochasticity vs real "
                    "attack resistance (needs --attack_through_defense "
                    "yes)")
    ap.add_argument("--detect", action="store_true",
                    help="also report attack DETECTION by reconstruction "
                    "error (paper section 5.1): ROC AUC between the clean "
                    "and adversarial test sets' final projection losses, "
                    "the detection rate at 5%% FPR, the two-sided variant "
                    "(|err - clean median|, robust to rec-penalty attacks "
                    "that push errors BELOW clean), and the joint two-layer "
                    "number: fraction of adversarial inputs both "
                    "misclassified through the defense AND unflagged at "
                    "5%% FPR")
    ap.add_argument("--results_dir", default="output/results")
    ap.add_argument("--save_adv", default=None, metavar="PATH.npz",
                    help="save the crafted adversarial set (x_adv, y, "
                    "x_clean, attack meta) for downstream experiments "
                    "(e.g. scripts/pipeline_exp.py serving-pipeline "
                    "evaluation) — crafting stays single-sourced here")
    ap.add_argument("--save_adv_pngs", action="store_true",
                    help="with --save_adv: also dump every original and "
                    "adversarial image as its own PNG next to the npz "
                    "(reference save_images_files parity)")
    ap.add_argument("--load_adv", default=None, metavar="PATH.npz",
                    help="replay a saved adversarial set (--save_adv "
                    "output) instead of crafting: x_clean/y/x_adv come "
                    "from the npz, so new detectors/eval settings can be "
                    "measured against an expensive attack without paying "
                    "the craft again. Requires --attack_type none (the "
                    "set's own attack provenance is in its meta and is "
                    "recorded in the results row)")
    ap.add_argument("--detect_passes", type=int, default=1, metavar="K",
                    help="with --detect: score detection features "
                    "averaged over K independent projection passes "
                    "(distinct keys, clean/adv pairs share each key). "
                    "An attacker optimizes the EXPECTED statistic over "
                    "restart keys, so averaging concentrates both "
                    "distributions around their means and widens the "
                    "detector's separation at K-x serving cost; "
                    "per-pass features are saved by --detect_save for "
                    "offline K-sweeps")
    ap.add_argument("--detect_save", default=None, metavar="PATH.npz",
                    help="with --detect: save the per-example paired "
                    "detection statistics (errs_clean, errs_adv, "
                    "defended_correct_adv, meta) for host-side analysis "
                    "(scripts/calibration_analysis.py: bootstrap AUC CIs, "
                    "threshold stability vs calibration-set size)")
    ap.add_argument("--save_images", action="store_true",
                    help="dump original|adversarial|purified grids into "
                    "results_dir (reference: utils/visualize.py dumps)")
    args = ap.parse_args(argv)
    if (args.attack_type == "cw" and args.cw_abort_early
            and args.cw_chunk_iters < 0):
        ap.error("--cw_abort_early requires the chunked CW driver; drop "
                 "--cw_chunk_iters -1 (0 = auto-chunk) or the abort flag")
    if args.attack_type == "rand_fgsm" and args.alpha >= args.fgsm_eps:
        ap.error(f"--alpha ({args.alpha}) must be < --fgsm_eps "
                 f"({args.fgsm_eps}) for rand_fgsm (the FGSM step is "
                 f"eps - alpha)")
    if args.eval_z0 == "both" and (args.defense_type != "defense_gan"
                                   or args.attack_type == "none"
                                   or args.attack_through_defense != "yes"):
        # catch at parse time: otherwise the run burns the full
        # attack+eval pipeline and only then silently skips the replay leg
        ap.error("--eval_z0 both replays the attack graph's z0, so it "
                 "requires --defense_type defense_gan, an attack, and "
                 "--attack_through_defense yes")
    if (args.eval_z0 == "both" and args.attack_type == "pgd"
            and args.pgd_z0 == "per_step"):
        ap.error("--eval_z0 both needs a single attack z0 to replay, but "
                 "--pgd_z0 per_step draws fresh z0 every PGD step (EOT); "
                 "use --pgd_z0 fixed for the replay leg")
    if args.eval_z0 == "both" and args.attack_type == "spsa":
        ap.error("--eval_z0 both needs a single attack z0 to replay, but "
                 "spsa draws fresh defense keys per (iteration, probe "
                 "chunk) — there is no one z0 to replay")
    if args.attack_grad == "bpda" and args.attack_type == "spsa":
        ap.error("spsa is gradient-free: it never differentiates through "
                 "the defense, so --attack_grad bpda has no effect; drop "
                 "the flag")
    if args.attack_eot_keys > 1:
        if (args.defense_type != "defense_gan"
                or args.attack_through_defense != "yes"
                or args.attack_type in ("none", "spsa")):
            ap.error("--attack_eot_keys averages the THROUGH-DEFENSE "
                     "logits over projection keys; it requires a gradient "
                     "attack (fgsm/rand_fgsm/pgd/cw), --defense_type "
                     "defense_gan, and --attack_through_defense yes (spsa "
                     "already re-draws defense keys every iteration)")
        if args.pgd_rec_penalty:
            ap.error("--attack_eot_keys wraps the logits target; the "
                     "--pgd_rec_penalty loss path does not support it yet")
        if args.eval_z0 == "both":
            ap.error("--eval_z0 both needs a single attack z0 to replay, "
                     "but --attack_eot_keys consumes K split keys per "
                     "evaluation")
    if args.pgd_rec_penalty and (args.attack_type != "pgd"
                                 or args.defense_type != "defense_gan"
                                 or args.attack_through_defense != "yes"):
        ap.error("--pgd_rec_penalty penalizes the THROUGH-DEFENSE "
                 "projection loss; it requires --attack_type pgd, "
                 "--defense_type defense_gan, and "
                 "--attack_through_defense yes")
    if args.pgd_rec_center is not None and not args.pgd_rec_penalty:
        ap.error("--pgd_rec_center shapes the --pgd_rec_penalty term; "
                 "set a nonzero --pgd_rec_penalty")
    if args.spsa_rec_penalty and (args.attack_type != "spsa"
                                  or args.defense_type != "defense_gan"
                                  or args.attack_through_defense != "yes"):
        ap.error("--spsa_rec_penalty penalizes the THROUGH-DEFENSE "
                 "projection loss; it requires --attack_type spsa, "
                 "--defense_type defense_gan, and "
                 "--attack_through_defense yes")
    if args.spsa_rec_center is not None and not args.spsa_rec_penalty:
        ap.error("--spsa_rec_center shapes the --spsa_rec_penalty term; "
                 "set a nonzero --spsa_rec_penalty")
    if args.spsa_center_quantiles is not None:
        if not args.spsa_rec_penalty:
            ap.error("--spsa_center_quantiles shapes the "
                     "--spsa_rec_penalty term; set a nonzero "
                     "--spsa_rec_penalty")
        if args.spsa_rec_center is not None:
            ap.error("--spsa_center_quantiles (per-image dispersed) and "
                     "--spsa_rec_center (fixed C) are mutually exclusive")
        lo_q, hi_q = args.spsa_center_quantiles
        if not 0.0 <= lo_q < hi_q <= 1.0:
            ap.error("--spsa_center_quantiles needs 0 <= LO < HI <= 1")
    if args.spsa_objective == "confident":
        if args.attack_type != "spsa" or args.defense_type != "defense_gan" \
                or args.attack_through_defense != "yes":
            ap.error("--spsa_objective confident targets the two-feature "
                     "detector's PURIFIED-margin statistic; it requires "
                     "--attack_type spsa, --defense_type defense_gan and "
                     "--attack_through_defense yes")
        if args.spsa_margin_kappa is None:
            ap.error("--spsa_objective confident needs --spsa_margin_kappa "
                     "(the purified-margin level to aim above; use the "
                     "clean margin median printed by --detect)")
    elif args.spsa_margin_kappa is not None:
        ap.error("--spsa_margin_kappa only shapes --spsa_objective "
                 "confident")
    if args.save_adv_pngs and not args.save_adv:
        ap.error("--save_adv_pngs dumps next to the --save_adv npz; "
                 "set --save_adv PATH.npz")
    if args.load_adv:
        if args.attack_type != "none":
            ap.error("--load_adv replays the npz's adversarial set; use "
                     "--attack_type none (the set's attack provenance "
                     "comes from its meta)")
        if args.save_adv:
            ap.error("--load_adv with --save_adv would re-save the same "
                     "set; drop one")
    if args.detect and args.attack_type == "none" and not args.load_adv:
        ap.error("--detect compares clean vs adversarial reconstruction "
                 "errors; it needs an --attack_type (or --load_adv)")
    if args.detect_save and not args.detect:
        ap.error("--detect_save saves the --detect statistics; add "
                 "--detect")
    if args.detect_passes < 1:
        ap.error("--detect_passes must be >= 1")
    if args.detect_passes > 1 and not args.detect:
        ap.error("--detect_passes shapes the --detect scoring; add "
                 "--detect")
    if args.attack_grad == "bpda" and (args.defense_type != "defense_gan"
                                       or args.attack_type == "none"
                                       or args.attack_through_defense
                                       != "yes"):
        ap.error("--attack_grad bpda approximates the gradient THROUGH "
                 "the defense; it requires --defense_type defense_gan, an "
                 "attack, and --attack_through_defense yes")
    if args.online_training:
        args.train_on_recs = True
    cfg = cfg_from_args(args)

    ds = load_data(cfg)
    x_train, y_train = ds.load("train")
    x_test, y_test = ds.load("test")
    x_test, y_test = limit(x_test, y_test, args.num_tests)

    adv_meta = None
    x_adv_loaded = None
    if args.load_adv:
        d = np.load(args.load_adv, allow_pickle=False)
        adv_meta = json.loads(str(d["meta"]))
        x_test, y_test = limit(d["x_clean"], d["y"], args.num_tests)
        x_adv_loaded = np.asarray(d["x_adv"])[:x_test.shape[0]]
        print(f"replaying adversarial set {args.load_adv} "
              f"({x_adv_loaded.shape[0]} examples; attack "
              f"{adv_meta.get('attack')}, meta {adv_meta})")

    need_gan = (args.defense_type == "defense_gan" or args.train_on_recs
                or args.detect)
    gan = load_gan(cfg, require_trained=False)
    if need_gan and not gan.can_load():
        print("WARNING: no trained GAN checkpoint found; defense uses "
              "current (possibly random) generator weights")

    key = jax.random.key(cfg.seed + 7)
    k_clf, k_att, k_eval = jax.random.split(key, 3)
    timer = PhaseTimer()
    with timer.phase("train_classifier"):
        clf = get_classifier(cfg, args, gan, x_train, y_train, k_clf)
    logits_fn = clf.logits_fn()

    with timer.phase("clean_eval"):
        clean_acc = model_eval(logits_fn, x_test, y_test)
    print(f"clean accuracy ({args.model}): {clean_acc:.4f}")

    clean_defended_acc = None
    if args.defense_type == "defense_gan":
        # paper also reports accuracy on purified CLEAN inputs — the
        # defense's no-attack cost and the key diagnostic for
        # classifier-vs-reconstruction domain shift
        with timer.phase("purify_classify_clean"):
            clean_defended_acc = model_eval_gan(gan, logits_fn, x_test,
                                                y_test, key=k_eval)
        print(f"clean accuracy through Defense-GAN: {clean_defended_acc:.4f}")

    # --- attack target: classifier, or classifier o reconstruct (unrolled)
    attack_rec_iters = args.attack_rec_iters or cfg.rec_iters
    through_defense = (args.defense_type == "defense_gan"
                       and args.attack_type != "none"
                       and args.attack_through_defense == "yes")
    if through_defense and args.attack_type == "spsa":
        # SPSA never differentiates: its defended target is the REAL
        # inference path (back_prop=False — auto kernel dispatch, i.e.
        # the Pallas kernels on TPU), built in the craft branch below.
        attack_target = None
    elif through_defense:
        # the attack differentiates through the unrolled projection
        # (back_prop=True), composed inside the attack's own jit. The
        # restart inits are seeded PER ATTACK BATCH (key argument; round-2
        # review: a fixed constant seeded every batch identically), so
        # --eval_z0 both can reproduce them exactly at eval time. The
        # composition lives in attacks/compose.py — shared with the
        # experiment scripts, and it pins unroll=cfg.rec_unroll to the
        # same value the replay leg's reconstruct uses.
        attack_target = make_attack_target(gan, logits_fn, cfg,
                                           rec_iters=attack_rec_iters,
                                           grad_mode=args.attack_grad)
        if args.attack_eot_keys > 1:
            # vote-aware attacker: optimize the EXPECTED defended logits
            # over the restart lottery (attacks/compose.py::eot_over_keys)
            attack_target = eot_over_keys(attack_target,
                                          args.attack_eot_keys)
            print(f"attack target: EOT over {args.attack_eot_keys} "
                  "projection keys per evaluation")
    else:
        attack_target = logits_fn

    # --- craft adversarial examples in jitted batches
    t0 = time.time()
    if args.load_adv:
        x_adv = x_adv_loaded
    elif args.attack_type == "none":
        x_adv = x_test.copy()
    else:
        if args.attack_type == "fgsm":
            @jax.jit
            def craft(xb, yb, k):
                tgt = ((lambda x: attack_target(x, k)) if through_defense
                       else attack_target)
                return fgsm(tgt, xb, yb, args.fgsm_eps)
        elif args.attack_type == "rand_fgsm":
            @jax.jit
            def craft(xb, yb, k):
                kz, kn = split_rand_fgsm_key(k)  # z0 half replayed by
                # attack_z0_key in the --eval_z0 both leg
                tgt = ((lambda x: attack_target(x, kz)) if through_defense
                       else attack_target)
                return rand_fgsm(tgt, xb, yb, args.fgsm_eps,
                                 args.alpha, kn)
        elif args.attack_type == "pgd":
            per_step = args.pgd_z0 == "per_step"
            pgd_loss = None
            if args.pgd_rec_penalty:
                from defensegan_tpu.attacks import make_attack_loss
                pgd_loss = make_attack_loss(
                    gan, logits_fn, cfg, rec_iters=attack_rec_iters,
                    grad_mode=args.attack_grad,
                    rec_penalty=args.pgd_rec_penalty,
                    rec_center=args.pgd_rec_center)
            chunk = args.pgd_chunk_iters
            if chunk == 0:
                # auto: through the defense each step pays a full L-step
                # projection (plus its backward under exact grad) — bound
                # the device program; bare-classifier PGD fuses fine
                if through_defense:
                    chunk = 5 if args.attack_grad == "exact" else 20
                else:
                    chunk = -1
            if chunk > 0:
                chunk = max(1, min(chunk, args.pgd_iters))
                print(f"PGD: host-chunked, {chunk} steps per device call")
                chunked = make_chunked_pgd(
                    attack_target, eps=args.fgsm_eps,
                    eps_iter=args.pgd_eps_iter, nb_iter=args.pgd_iters,
                    rand_init=args.pgd_rand_init, chunk_iters=chunk,
                    keyed_logits=through_defense, per_step_keys=per_step,
                    verbose=through_defense, loss_fn=pgd_loss)

                def craft(xb, yb, k):
                    return chunked(xb, yb, k)
            else:
                @jax.jit
                def craft(xb, yb, k):
                    return pgd(attack_target, xb, yb, args.fgsm_eps,
                               args.pgd_eps_iter, args.pgd_iters, key=k,
                               rand_init=args.pgd_rand_init,
                               keyed_logits=through_defense,
                               per_step_keys=per_step, loss_fn=pgd_loss)
        elif args.attack_type == "spsa":
            from defensegan_tpu.attacks import (confident_margin_loss,
                                                make_spsa, margin_loss)

            cen_q = args.spsa_center_quantiles
            clean_err_sorted = None
            cen_holder = {"cen": None}  # [B] per attack batch
            if through_defense:
                # the attacker's oracle is the DEPLOYED defended
                # classifier: the cached inference projection program
                # (auto kernel — Pallas on TPU) + classifier. Gradient
                # attacks cannot use this path (not differentiable);
                # SPSA's finite differences can — this is the only
                # attack here that probes the exact serving bits.
                lam = args.spsa_rec_penalty
                cen = args.spsa_rec_center
                kappa = args.spsa_margin_kappa
                confident = args.spsa_objective == "confident"
                if cen_q is not None:
                    # the fully-informed attacker knows the clean rec-err
                    # distribution: measure it once on the deployed
                    # inference path (one projection pass)
                    n_cal = int(min(256, x_test.shape[0]))
                    res_cal = gan.reconstruct(
                        jnp.asarray(x_test[:n_cal]),
                        jax.random.fold_in(k_att, 7709),
                        rec_iters=attack_rec_iters)
                    clean_err_sorted = np.sort(
                        np.asarray(res_cal.loss, np.float64))
                    print(f"spsa dispersed centers: per-image clean "
                          f"rec-err quantiles u ~ U[{cen_q[0]}, "
                          f"{cen_q[1]}] from {n_cal} clean "
                          f"reconstructions (median "
                          f"{float(np.median(clean_err_sorted)):.5f})")
                if lam or confident:
                    # detection-aware: res.loss IS the detector statistic
                    # (eval/detect.py scores the same projection loss), so
                    # the gradient-free attacker optimizes the true
                    # detection margin — the --pgd_rec_penalty analogue
                    # minus the BPDA approximation. With the confident
                    # objective the margin statistic is ALSO the detector's
                    # (top1-top2 on the purified image when winning), so
                    # the full objective conf - kappa - lam*|rec - C| is
                    # positive only for examples beating the classifier
                    # AND both combined-detector features under the
                    # attack's own keys — exactly what freeze_on_success
                    # should freeze.
                    def _pen(rl, cenv):
                        if not lam:
                            return jnp.zeros_like(rl)
                        if cen_q is not None:
                            return lam * jnp.abs(rl - cenv)
                        return lam * (jnp.abs(rl - cen) if cen is not None
                                      else rl)
                    if confident:
                        post = jax.jit(
                            lambda xh, y, rl, cenv:
                            confident_margin_loss(logits_fn(xh), y)
                            - kappa - _pen(rl, cenv))
                    else:
                        post = jax.jit(
                            lambda xh, y, rl, cenv:
                            margin_loss(logits_fn(xh), y)
                            - _pen(rl, cenv))

                    def spsa_loss(x_flat, y_flat, k):
                        res = gan.reconstruct(x_flat, k,
                                              rec_iters=attack_rec_iters)
                        cb = cen_holder["cen"]
                        if cb is None:
                            cenv = jnp.zeros_like(res.loss)
                        else:
                            # probe batches are [S*B]; tile the per-image
                            # centers to match (current-point eval: S=1)
                            cenv = jnp.tile(cb,
                                            x_flat.shape[0] // cb.shape[0])
                        return post(res.x_hat, y_flat, res.loss, cenv)
                else:
                    post = jax.jit(
                        lambda xh, y: margin_loss(logits_fn(xh), y))

                    def spsa_loss(x_flat, y_flat, k):
                        x_hat = gan.reconstruct(x_flat, k,
                                                rec_iters=attack_rec_iters
                                                ).x_hat
                        return post(x_hat, y_flat)
            else:
                spsa_loss_j = jax.jit(
                    lambda xf, y, k: margin_loss(logits_fn(xf), y))

                def spsa_loss(x_flat, y_flat, k):
                    return spsa_loss_j(x_flat, y_flat, k)
            spsa_attack = make_spsa(
                spsa_loss, eps=args.fgsm_eps, nb_iter=args.spsa_iters,
                n_samples=args.spsa_samples, delta=args.spsa_delta,
                lr=args.spsa_lr, chunk_samples=args.spsa_chunk,
                verbose=through_defense)

            def craft(xb, yb, k):
                if clean_err_sorted is not None:
                    # per-image dispersed centers, derived from the batch
                    # key (deterministic + replayable like the z0 keys)
                    u = np.asarray(jax.random.uniform(
                        jax.random.fold_in(k, 2 ** 24), (xb.shape[0],),
                        minval=cen_q[0], maxval=cen_q[1]))
                    cen_holder["cen"] = jnp.asarray(
                        np.quantile(clean_err_sorted, u), jnp.float32)
                return spsa_attack(xb, yb, k)
        else:  # cw
            cw_cfg = CWConfig(
                binary_search_steps=args.cw_binary_search_steps,
                max_iterations=args.cw_max_iterations)
            chunk = args.cw_chunk_iters
            if chunk == 0:
                chunk = 100 if (through_defense or args.cw_abort_early) \
                    else -1
            if chunk > 0:
                chunk = effective_cw_chunk(cw_cfg, chunk,
                                           args.cw_abort_early)
                print(f"CW: host-chunked, {chunk} iterations per device call"
                      + (", abort_early" if args.cw_abort_early else ""))
                # factory: the jitted chunk is compiled once and reused
                # across all attack batches
                chunked = make_chunked_cw(
                    attack_target, cw_cfg, chunk_iters=chunk,
                    abort_early=args.cw_abort_early,
                    verbose=through_defense,
                    keyed_logits=through_defense)

                def craft(xb, yb, k):
                    return chunked(xb, yb, k if through_defense else None)
            else:
                @jax.jit
                def craft(xb, yb, k):
                    return carlini_wagner_l2(
                        attack_target, xb, yb, cw_cfg,
                        key=k if through_defense else None)

        advs = []
        bs = args.attack_batch
        n = x_test.shape[0]
        pad_to = ((n + bs - 1) // bs) * bs
        xp = np.concatenate([x_test,
                             np.zeros((pad_to - n,) + x_test.shape[1:],
                                      x_test.dtype)])
        yp = np.concatenate([y_test, np.zeros(pad_to - n, y_test.dtype)])
        for i in range(0, pad_to, bs):
            advs.append(np.asarray(craft(jnp.asarray(xp[i:i + bs]),
                                         jnp.asarray(yp[i:i + bs]),
                                         attack_batch_key(k_att, i))))
        x_adv = np.concatenate(advs)[:n]
    attack_time = time.time() - t0
    timer.record("attack", attack_time)
    print(f"crafted {args.attack_type} adversarial examples in "
          f"{attack_time:.1f}s")

    if args.save_adv:
        ensure_dir(os.path.dirname(args.save_adv) or ".")
        meta = {"dataset": cfg.type, "attack": args.attack_type,
                "attack_grad": (args.attack_grad if through_defense
                                else None),
                "attack_through_defense": args.attack_through_defense,
                "attack_eot_keys": args.attack_eot_keys}
        if args.attack_type in ("fgsm", "rand_fgsm", "pgd", "spsa"):
            meta["fgsm_eps"] = args.fgsm_eps
        if args.attack_type == "spsa":
            meta.update(spsa_iters=args.spsa_iters,
                        spsa_samples=args.spsa_samples,
                        spsa_delta=args.spsa_delta,
                        spsa_lr=args.spsa_lr,
                        spsa_rec_penalty=args.spsa_rec_penalty,
                        spsa_rec_center=args.spsa_rec_center,
                        spsa_center_quantiles=args.spsa_center_quantiles,
                        spsa_objective=args.spsa_objective,
                        spsa_margin_kappa=args.spsa_margin_kappa)
        if args.attack_type == "pgd":
            meta.update(pgd_iters=args.pgd_iters,
                        pgd_eps_iter=args.pgd_eps_iter,
                        pgd_z0=args.pgd_z0,
                        pgd_rec_penalty=args.pgd_rec_penalty,
                        pgd_rec_center=args.pgd_rec_center)
        if args.attack_type == "cw":
            meta.update(cw_max_iterations=args.cw_max_iterations,
                        cw_binary_search_steps=args.cw_binary_search_steps)
        np.savez(args.save_adv, x_adv=x_adv, y=y_test, x_clean=x_test,
                 meta=json.dumps(meta))
        print(f"saved adversarial set to {args.save_adv}")
        if args.save_adv_pngs:
            from defensegan_tpu.utils.visualize import save_images_files

            png_dir = os.path.splitext(args.save_adv)[0] + "_pngs"
            labels = np.asarray(y_test).tolist()
            save_images_files(x_test, png_dir, prefix="orig", labels=labels)
            save_images_files(x_adv, png_dir, prefix="adv", labels=labels)
            print(f"wrote {2 * len(x_adv)} per-image PNGs under {png_dir}/ "
                  "(reference save_images_files parity)")

    with timer.phase("adv_eval"):
        adv_acc = model_eval(logits_fn, x_adv, y_test)
    print(f"adversarial accuracy, NO defense: {adv_acc:.4f}")

    if args.save_images and args.defense_type == "defense_gan":
        from defensegan_tpu.utils.visualize import save_images

        n_show = min(16, x_test.shape[0])
        res = gan.reconstruct(jnp.asarray(x_adv[:n_show]),
                              jax.random.fold_in(k_eval, 99))
        trio = np.stack([x_test[:n_show], x_adv[:n_show],
                         np.asarray(res.x_hat)], 1)
        path = save_images(trio.reshape((-1,) + x_test.shape[1:]),
                           os.path.join(args.results_dir,
                                        f"whitebox_{cfg.type}_"
                                        f"{args.attack_type}.png"),
                           grid=(n_show, 3))
        print(f"wrote {path} (rows: original | adversarial | purified)")
        # per-image dumps of the same trio (reference save_images_files
        # parity for the attack driver; train.py --rec_pngs covers the
        # clean test-mode dumps)
        from defensegan_tpu.utils.visualize import save_images_files

        png_dir = os.path.join(args.results_dir,
                               f"whitebox_{cfg.type}_"
                               f"{args.attack_type}_pngs")
        labels = np.asarray(y_test[:n_show]).tolist()
        save_images_files(x_test[:n_show], png_dir, prefix="orig",
                          labels=labels)
        save_images_files(x_adv[:n_show], png_dir, prefix="adv",
                          labels=labels)
        save_images_files(np.asarray(res.x_hat), png_dir, prefix="purified",
                          labels=labels)
        print(f"wrote {3 * n_show} per-image PNGs under {png_dir}/")

    defended_acc = None
    defended_acc_attack_z0 = None
    defended_correct_adv = None
    if args.defense_type == "defense_gan":
        t0 = time.time()
        with timer.phase("purify_classify_adv"):
            defended_acc, defended_correct_adv = model_eval_gan(
                gan, logits_fn, x_adv, y_test, key=k_eval,
                return_correct=True)
        print(f"adversarial accuracy, Defense-GAN (R={cfg.rec_rr}, "
              f"L={cfg.rec_iters}): {defended_acc:.4f} "
              f"[{time.time() - t0:.1f}s]")
        if (args.eval_z0 == "both" and through_defense
                and args.attack_type != "none"):
            # reuse the attack graph's exact per-batch z0: same batch
            # partitioning, same per-batch keys (attack_z0_key shares its
            # derivation with the craft loop — attacks/compose.py), L =
            # the attack graph's rec_iters, AND the attack graph's
            # numeric path (rec_kernel="xla": the attack differentiates
            # through the generic f32 reconstruct; letting auto resolve
            # to the bf16 Pallas kernel here would diverge from the
            # trajectory the attacker optimized against and re-introduce
            # stochasticity into the leg meant to remove it). The
            # fresh-vs-attack gap = restart stochasticity's contribution
            # to defended accuracy.
            def key_fn(lo):
                return attack_z0_key(k_att, lo, args.attack_type)
            with timer.phase("purify_classify_adv_attack_z0"):
                defended_acc_attack_z0 = model_eval_gan(
                    gan, logits_fn, x_adv, y_test,
                    batch_size=args.attack_batch,
                    rec_iters=attack_rec_iters, rec_kernel="xla",
                    key_fn=key_fn)
            print(f"adversarial accuracy, Defense-GAN with the ATTACK's "
                  f"z0 (L={attack_rec_iters}): "
                  f"{defended_acc_attack_z0:.4f}")
    elif args.defense_type == "adv_tr":
        defended_acc = adv_acc  # the defense is in the classifier weights

    # --- attack DETECTION by reconstruction error (paper section 5.1:
    # adversarial inputs sit farther from the generator manifold, so the
    # final projection loss separates clean from attacked; eval/detect.py)
    detection_auc = None
    detection_tpr_fpr05 = None
    detection_auc_2s = None
    detection_tpr_fpr05_2s = None
    detection_auc_comb = None
    detection_tpr_fpr05_comb = None
    undetected_success = None
    undetected_success_2s = None
    undetected_success_comb = None
    rec_err_clean = rec_err_adv = None
    margin_clean = margin_adv = None
    if args.detect:
        from defensegan_tpu.eval import (combined_scores,
                                         detection_features, roc_auc,
                                         tpr_at_fpr, two_sided_scores,
                                         undetected_success_rate)

        with timer.phase("detect"):
            # same base key for both passes => corresponding batches draw
            # identical restart z0: the clean/adv error comparison is
            # paired, not confounded by restart luck. One shared pass
            # also yields the purified-margin feature (top1-top2 logit on
            # G(z*)) for the two-feature detector.
            k_det = jax.random.fold_in(k_eval, 555)
            passes_c, passes_a = [], []
            for p in range(args.detect_passes):
                # pass 0 keeps the historical key (k_det itself), so
                # K=1 reproduces every committed row bit-for-bit
                kp = k_det if p == 0 else jax.random.fold_in(k_det, p)
                passes_c.append(detection_features(
                    gan, x_test, logits_fn, key=kp))
                passes_a.append(detection_features(
                    gan, x_adv, logits_fn, key=kp))
            # K-pass features: the attacker optimizes the EXPECTED
            # statistics over keys; averaging K independent draws
            # shrinks both classes' spread ~sqrt(K) around means the
            # attacker could only partially move — wider separation for
            # K-x detection cost (RESULTS.md round-5 K-sweep)
            errs_clean_pp = np.stack([f.errs for f in passes_c])
            errs_adv_pp = np.stack([f.errs for f in passes_a])
            marg_clean_pp = np.stack([f.margins for f in passes_c])
            marg_adv_pp = np.stack([f.margins for f in passes_a])
            preds_clean_pp = np.stack([f.preds for f in passes_c])
            preds_adv_pp = np.stack([f.preds for f in passes_a])
            errs_clean = errs_clean_pp.mean(0)
            errs_adv = errs_adv_pp.mean(0)
            marg_clean = marg_clean_pp.mean(0)
            marg_adv = marg_adv_pp.mean(0)
            alll_clean = passes_c[0].all_losses
            alll_adv = passes_a[0].all_losses
        detection_auc = roc_auc(errs_clean, errs_adv)
        detection_tpr_fpr05, _ = tpr_at_fpr(errs_clean, errs_adv, 0.05)
        rec_err_clean = float(errs_clean.mean())
        rec_err_adv = float(errs_adv.mean())
        # two-sided statistic |err - clean median|: catches rec-penalty
        # attacks (--pgd_rec_penalty) that push rec error BELOW clean
        s_clean_2s = two_sided_scores(errs_clean, errs_clean)
        s_adv_2s = two_sided_scores(errs_adv, errs_clean)
        detection_auc_2s = roc_auc(s_clean_2s, s_adv_2s)
        detection_tpr_fpr05_2s, _ = tpr_at_fpr(s_clean_2s, s_adv_2s, 0.05)
        # two-feature combined: max(two-sided rec-err atypicality,
        # low-tail purified-margin atypicality), both ECDF-calibrated on
        # the clean set — targets the CW gap (near-manifold but barely
        # flipped decisions => atypically low purified margin)
        margin_clean = float(marg_clean.mean())
        margin_adv = float(marg_adv.mean())
        s_clean_comb = combined_scores(errs_clean, marg_clean,
                                       errs_clean, marg_clean)
        s_adv_comb = combined_scores(errs_adv, marg_adv,
                                     errs_clean, marg_clean)
        detection_auc_comb = roc_auc(s_clean_comb, s_adv_comb)
        detection_tpr_fpr05_comb, _ = tpr_at_fpr(s_clean_comb,
                                                 s_adv_comb, 0.05)
        print(f"attack detection by rec error: AUC {detection_auc:.4f}, "
              f"detection rate {detection_tpr_fpr05:.4f} @ 5% FPR "
              f"(mean rec err clean {rec_err_clean:.5f} vs adversarial "
              f"{rec_err_adv:.5f}); two-sided AUC {detection_auc_2s:.4f}, "
              f"rate {detection_tpr_fpr05_2s:.4f}")
        print(f"two-feature detection (rec err + purified margin): AUC "
              f"{detection_auc_comb:.4f}, rate "
              f"{detection_tpr_fpr05_comb:.4f} @ 5% FPR (mean purified "
              f"margin clean {margin_clean:.3f} vs adversarial "
              f"{margin_adv:.3f}; clean margin median "
              f"{float(np.median(marg_clean)):.3f}) "
              "[ECDF calibration is IN-SAMPLE on this clean eval set — "
              "mildly optimistic vs a held-out-calibrated deployment; "
              "see eval/detect.py::calibration_sweep(detector='combined') "
              "and the DefendedPipeline rows for the held-out figure]")
        if defended_correct_adv is not None:
            # the joint two-layer number: misclassified by the defended
            # pipeline AND unflagged at 5% FPR. Cross-pass estimate —
            # correctness from the eval pass, flags from the paired
            # detect pass (see undetected_success_rate docstring); the
            # single-pass serving number is DefendedPipeline's.
            undetected_success, _ = undetected_success_rate(
                errs_clean, errs_adv, ~defended_correct_adv)
            undetected_success_2s, _ = undetected_success_rate(
                s_clean_2s, s_adv_2s, ~defended_correct_adv)
            undetected_success_comb, _ = undetected_success_rate(
                s_clean_comb, s_adv_comb, ~defended_correct_adv)
            print(f"undetected successful attacks @ 5% FPR: "
                  f"{undetected_success:.4f} one-sided / "
                  f"{undetected_success_2s:.4f} two-sided / "
                  f"{undetected_success_comb:.4f} two-feature")
        if args.detect_save:
            ensure_dir(os.path.dirname(args.detect_save) or ".")
            meta = {"dataset": cfg.type, "model": args.model,
                    "attack": args.attack_type,
                    "defense": args.defense_type,
                    "fgsm_eps": args.fgsm_eps,
                    "detect_passes": args.detect_passes,
                    "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters,
                    "rec_init": cfg.rec_init}
            if adv_meta is not None:
                meta["attack"] = adv_meta.get("attack")
                meta["replayed_from"] = args.load_adv
                meta["adv_meta"] = adv_meta
            if args.attack_eot_keys > 1:
                meta["attack_eot_keys"] = args.attack_eot_keys
            if args.attack_type == "pgd":
                meta.update(pgd_rec_penalty=args.pgd_rec_penalty,
                            pgd_rec_center=args.pgd_rec_center,
                            pgd_iters=args.pgd_iters)
            if args.attack_type == "spsa":
                # full SPSA provenance (round-4 advisor: the saved
                # capstone detstats lost the lam/center that made the
                # result re-analyzable)
                meta.update(spsa_iters=args.spsa_iters,
                            spsa_samples=args.spsa_samples,
                            spsa_delta=args.spsa_delta,
                            spsa_lr=args.spsa_lr,
                            spsa_rec_penalty=args.spsa_rec_penalty,
                            spsa_rec_center=args.spsa_rec_center,
                            spsa_center_quantiles=args.spsa_center_quantiles,
                            spsa_objective=args.spsa_objective,
                            spsa_margin_kappa=args.spsa_margin_kappa)
            arrays = {"errs_clean": errs_clean, "errs_adv": errs_adv,
                      "margins_clean": marg_clean, "margins_adv": marg_adv,
                      "all_losses_clean": alll_clean,
                      "all_losses_adv": alll_adv,
                      "y": np.asarray(y_test, np.int32)}
            if args.detect_passes > 1:
                # per-pass features [K, N]: any K' <= K detector is a
                # subset-average away (offline K-sweeps, no chip). The
                # per-pass purified PREDICTIONS enable the other use of
                # K passes: majority-vote prediction + vote-disagreement
                # detection (kpass_analysis.py --vote).
                arrays.update(errs_clean_pp=errs_clean_pp,
                              errs_adv_pp=errs_adv_pp,
                              margins_clean_pp=marg_clean_pp,
                              margins_adv_pp=marg_adv_pp,
                              preds_clean_pp=preds_clean_pp,
                              preds_adv_pp=preds_adv_pp)
            if defended_correct_adv is not None:
                arrays["defended_correct_adv"] = np.asarray(
                    defended_correct_adv, bool)
            np.savez(args.detect_save, meta=json.dumps(meta), **arrays)
            print(f"saved per-example detection statistics to "
                  f"{args.detect_save}")

    ensure_dir(args.results_dir)
    record = {
        "script": "whitebox", "dataset": cfg.type, "model": args.model,
        "attack": (f"{adv_meta.get('attack', '?')}_replay"
                   if args.load_adv else args.attack_type),
        "load_adv": args.load_adv, "adv_meta": adv_meta,
        "detect_passes": args.detect_passes if args.detect else None,
        "defense": args.defense_type,
        "fgsm_eps": args.fgsm_eps, "num_tests": int(x_test.shape[0]),
        "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters,
        "rec_init": (cfg.rec_init if cfg.rec_init != "random" else None),
        "attack_rec_iters": (attack_rec_iters
                             if args.attack_type != "none" else None),
        "attack_eot_keys": (args.attack_eot_keys
                            if args.attack_eot_keys > 1 else None),
        "attack_batch": args.attack_batch,
        "cw_max_iterations": (args.cw_max_iterations
                              if args.attack_type == "cw" else None),
        "cw_binary_search_steps": (args.cw_binary_search_steps
                                   if args.attack_type == "cw" else None),
        "cw_abort_early": (args.cw_abort_early
                           if args.attack_type == "cw" else None),
        "pgd_iters": (args.pgd_iters
                      if args.attack_type == "pgd" else None),
        "pgd_eps_iter": (args.pgd_eps_iter
                         if args.attack_type == "pgd" else None),
        "pgd_rand_init": (args.pgd_rand_init
                          if args.attack_type == "pgd" else None),
        "pgd_z0": (args.pgd_z0 if args.attack_type == "pgd"
                   and through_defense else None),
        "pgd_rec_penalty": (args.pgd_rec_penalty
                            if args.attack_type == "pgd" else None),
        "pgd_rec_center": (args.pgd_rec_center
                           if args.attack_type == "pgd" else None),
        "spsa_iters": (args.spsa_iters
                       if args.attack_type == "spsa" else None),
        "spsa_samples": (args.spsa_samples
                         if args.attack_type == "spsa" else None),
        "spsa_delta": (args.spsa_delta
                       if args.attack_type == "spsa" else None),
        "spsa_lr": (args.spsa_lr
                    if args.attack_type == "spsa" else None),
        "spsa_rec_penalty": (args.spsa_rec_penalty
                             if args.attack_type == "spsa" else None),
        "spsa_rec_center": (args.spsa_rec_center
                            if args.attack_type == "spsa" else None),
        "spsa_center_quantiles": (args.spsa_center_quantiles
                                  if args.attack_type == "spsa" else None),
        "spsa_objective": (args.spsa_objective
                           if args.attack_type == "spsa" else None),
        "spsa_margin_kappa": (args.spsa_margin_kappa
                              if args.attack_type == "spsa" else None),
        "attack_through_defense": args.attack_through_defense,
        "attack_grad": ("none" if args.attack_type == "spsa" else
                        args.attack_grad) if through_defense else None,
        "attack_z0": ((("per_step" if args.attack_type == "spsa"
                        or (args.attack_type == "pgd"
                            and args.pgd_z0 == "per_step")
                        else "per_batch"))
                      if through_defense else None),
        "eval_z0": args.eval_z0,
        "train_on_recs": args.train_on_recs,
        "clean_acc": clean_acc, "clean_defended_acc": clean_defended_acc,
        "adv_acc_no_defense": adv_acc,
        "defended_acc": defended_acc,
        "defended_acc_attack_z0": defended_acc_attack_z0,
        "detection_auc": detection_auc,
        "detection_tpr_at_fpr05": detection_tpr_fpr05,
        "detection_auc_two_sided": detection_auc_2s,
        "detection_tpr_at_fpr05_two_sided": detection_tpr_fpr05_2s,
        "detection_auc_combined": detection_auc_comb,
        "detection_tpr_at_fpr05_combined": detection_tpr_fpr05_comb,
        "undetected_success_rate": undetected_success,
        "undetected_success_rate_two_sided": undetected_success_2s,
        "undetected_success_rate_combined": undetected_success_comb,
        "margin_clean_mean": margin_clean,
        "margin_adv_mean": margin_adv,
        "rec_err_clean_mean": rec_err_clean,
        "rec_err_adv_mean": rec_err_adv,
        "attack_time_s": round(attack_time, 2),
        "phases": timer.summary(),
    }
    print(f"phase breakdown: {timer}")
    append_jsonl(os.path.join(args.results_dir, "whitebox.jsonl"), record)
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
