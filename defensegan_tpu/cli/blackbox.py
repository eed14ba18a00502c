"""Black-box attack + defense evaluation CLI.

Reference parity: blackbox.py of kabkabm/defensegan (~L50-600), the
cleverhans mnist_blackbox recipe:
  python blackbox.py --cfg <dir-or-yml> --bb_model A --sub_model B
      [--fgsm_eps 0.3] [--data_aug 6] [--lmbda 0.1] [--num_tests N]
      [--defense_type {none,defense_gan}]

prep_bbox (train the black-box target) -> train_sub (Jacobian-augmentation
substitute, seeded with 150 held-out test images per the paper) -> FGSM on
the substitute -> transfer to the target, with and without Defense-GAN
purification.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.attacks import fgsm, train_substitute
from defensegan_tpu.cli.common import (add_cfg_args, cfg_from_args, limit,
                                       load_data, load_gan)
from defensegan_tpu.eval import model_eval, model_eval_gan, train_classifier
from defensegan_tpu.models import build_classifier
from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
from defensegan_tpu.utils.profiling import PhaseTimer

HOLDOUT = 150  # substitute seed size (paper / cleverhans tutorial)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_cfg_args(ap)
    ap.add_argument("--bb_model", default="A", help="black-box target A..F")
    ap.add_argument("--sub_model", default="B", help="substitute A..F")
    ap.add_argument("--defense_type", default="defense_gan",
                    choices=["none", "defense_gan", "adv_tr"],
                    help="adv_tr: target is FGSM-adversarially trained "
                    "(reference's adversarial-training baseline), no "
                    "purification")
    ap.add_argument("--fgsm_eps", type=float, default=0.3)
    ap.add_argument("--data_aug", type=int, default=6,
                    help="Jacobian augmentation rounds (rho)")
    ap.add_argument("--lmbda", type=float, default=0.1)
    ap.add_argument("--num_tests", type=int, default=512)
    ap.add_argument("--classifier_epochs", type=int, default=10)
    ap.add_argument("--sub_epochs", type=int, default=10)
    ap.add_argument("--sub_from_scratch", action="store_true",
                    help="ablation: retrain the substitute from scratch "
                    "every augmentation round (reference/cleverhans keeps "
                    "the same variables across rounds — the default here)")
    ap.add_argument("--train_on_recs", action="store_true",
                    help="train the target on Defense-GAN reconstructions "
                    "of the training set (reference --train_on_recs)")
    ap.add_argument("--num_rec_train", type=int, default=1024)
    ap.add_argument("--detect", action="store_true",
                    help="also report transfer-attack DETECTION by "
                    "reconstruction error (same statistics as whitebox "
                    "--detect: one/two-sided ROC AUC, detection rate at "
                    "5%% FPR, and the joint misclassified-AND-unflagged "
                    "rate; needs --defense_type defense_gan)")
    ap.add_argument("--detect_save", default=None, metavar="PATH.npz",
                    help="with --detect: save the per-example paired "
                    "detection statistics (errs/margins/all_losses for "
                    "clean+adv, defended_correct_adv, meta) for host-side "
                    "analysis — same layout as whitebox --detect_save "
                    "(scripts/{calibration,dispersion}_analysis.py)")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)
    if args.detect and args.defense_type != "defense_gan":
        ap.error("--detect scores inputs with the GAN projection loss — "
                 "it needs --defense_type defense_gan")
    if args.detect_save and not args.detect:
        ap.error("--detect_save stores the --detect statistics; add "
                 "--detect")
    cfg = cfg_from_args(args)

    ds = load_data(cfg)
    x_train, y_train = ds.load("train")
    x_test, y_test = ds.load("test")

    # paper protocol: first HOLDOUT test images seed the substitute; attack
    # is evaluated on the following num_tests images
    x_seed = x_test[:HOLDOUT]
    x_eval, y_eval = limit(x_test[HOLDOUT:], y_test[HOLDOUT:],
                           args.num_tests)

    key = jax.random.key(cfg.seed + 13)
    k_bb, k_sub, k_eval = jax.random.split(key, 3)

    gan = None
    if args.defense_type == "defense_gan" or args.train_on_recs:
        gan = load_gan(cfg, require_trained=False)
        if not gan.can_load():
            print("WARNING: no trained GAN checkpoint; purifying with "
                  "current generator weights")

    # --- prep_bbox: train the black-box target
    x_fit, y_fit = x_train, y_train
    if args.train_on_recs:
        n = min(args.num_rec_train, x_train.shape[0])
        print(f"reconstructing {n} training images for --train_on_recs ...")
        recs = []
        for i in range(0, n, 256):
            xb = jnp.asarray(x_train[i:i + 256])
            res = gan.reconstruct(xb, jax.random.fold_in(k_bb, i))
            recs.append(np.asarray(res.x_hat))
        x_fit, y_fit = np.concatenate(recs)[:n], y_train[:n]
    adv_eps = args.fgsm_eps if args.defense_type == "adv_tr" else None
    print(f"training black-box target model {args.bb_model}"
          + (f" (FGSM adv training eps={adv_eps})" if adv_eps else "")
          + " ...")
    timer = PhaseTimer()
    bb_model = build_classifier(args.bb_model, num_classes=cfg.num_classes)
    with timer.phase("train_target"):
        bb = train_classifier(bb_model, x_fit, y_fit, key=k_bb,
                              epochs=args.classifier_epochs, adv_eps=adv_eps,
                              quiet=False)
    bb_logits = bb.logits_fn()
    clean_acc = model_eval(bb_logits, x_eval, y_eval)
    print(f"target clean accuracy: {clean_acc:.4f}")

    # --- train_sub: Jacobian-augmentation substitute (oracle = target)
    print(f"training substitute model {args.sub_model} "
          f"({args.data_aug} augmentation rounds) ...")
    sub_model = build_classifier(args.sub_model, num_classes=cfg.num_classes)
    with timer.phase("train_substitute"):
        sub, x_sub = train_substitute(sub_model, bb_logits, x_seed,
                                      key=k_sub, data_aug=args.data_aug,
                                      lmbda=args.lmbda,
                                      epochs_per_round=args.sub_epochs,
                                      persistent=not args.sub_from_scratch,
                                      quiet=False)
    sub_logits = sub.logits_fn()
    agree = model_eval(sub_logits, x_eval,
                       np.asarray(jnp.argmax(bb_logits(jnp.asarray(x_eval)),
                                             -1)))
    print(f"substitute agreement with target: {agree:.4f} "
          f"(final sub set {x_sub.shape[0]})")

    # --- FGSM on the substitute, transferred to the target
    @jax.jit
    def craft(xb, yb):
        return fgsm(sub_logits, xb, yb, args.fgsm_eps)

    with timer.phase("attack"):
        advs = []
        bs = 256
        for i in range(0, x_eval.shape[0], bs):
            advs.append(np.asarray(craft(jnp.asarray(x_eval[i:i + bs]),
                                         jnp.asarray(y_eval[i:i + bs]))))
        x_adv = np.concatenate(advs)

    adv_acc = model_eval(bb_logits, x_adv, y_eval)
    print(f"target accuracy under transferred FGSM (eps={args.fgsm_eps}), "
          f"NO defense: {adv_acc:.4f}")

    defended_acc = None
    clean_defended_acc = None
    defended_correct_adv = None
    if args.defense_type == "adv_tr":
        defended_acc = adv_acc  # the defense is in the classifier weights
    if args.defense_type == "defense_gan":
        with timer.phase("purify_classify_clean"):
            clean_defended_acc = model_eval_gan(gan, bb_logits, x_eval,
                                                y_eval, key=k_eval)
        print(f"target accuracy on purified CLEAN inputs: "
              f"{clean_defended_acc:.4f}")
        with timer.phase("purify_classify_adv"):
            defended_acc, defended_correct_adv = model_eval_gan(
                gan, bb_logits, x_adv, y_eval, key=k_eval,
                return_correct=True)
        print(f"target accuracy under FGSM, Defense-GAN (R={cfg.rec_rr}, "
              f"L={cfg.rec_iters}): {defended_acc:.4f}")

    # --- transfer-attack detection by reconstruction error (mirrors
    # whitebox --detect; eval/detect.py)
    detection_auc = detection_tpr_fpr05 = None
    detection_auc_2s = detection_tpr_fpr05_2s = None
    detection_auc_comb = detection_tpr_fpr05_comb = None
    undetected_success = undetected_success_2s = None
    undetected_success_comb = None
    rec_err_clean = rec_err_adv = None
    if args.detect:
        from defensegan_tpu.eval import (combined_scores,
                                         detection_features, roc_auc,
                                         tpr_at_fpr, two_sided_scores,
                                         undetected_success_rate)

        with timer.phase("detect"):
            # paired restart keys for the clean/adv passes (same base key);
            # the shared pass also yields the purified-margin feature for
            # the two-feature detector (mirrors whitebox --detect). The
            # margins come from the TARGET classifier — the defender's
            # own model, exactly what a deployed detector can see.
            k_det = jax.random.fold_in(k_eval, 555)
            feats_clean = detection_features(gan, x_eval, bb_logits,
                                             key=k_det)
            feats_adv = detection_features(gan, x_adv, bb_logits, key=k_det)
            errs_clean, marg_clean = feats_clean.errs, feats_clean.margins
            errs_adv, marg_adv = feats_adv.errs, feats_adv.margins
        detection_auc = roc_auc(errs_clean, errs_adv)
        detection_tpr_fpr05, _ = tpr_at_fpr(errs_clean, errs_adv, 0.05)
        rec_err_clean = float(errs_clean.mean())
        rec_err_adv = float(errs_adv.mean())
        s_clean_2s = two_sided_scores(errs_clean, errs_clean)
        s_adv_2s = two_sided_scores(errs_adv, errs_clean)
        detection_auc_2s = roc_auc(s_clean_2s, s_adv_2s)
        detection_tpr_fpr05_2s, _ = tpr_at_fpr(s_clean_2s, s_adv_2s, 0.05)
        s_clean_comb = combined_scores(errs_clean, marg_clean,
                                       errs_clean, marg_clean)
        s_adv_comb = combined_scores(errs_adv, marg_adv,
                                     errs_clean, marg_clean)
        detection_auc_comb = roc_auc(s_clean_comb, s_adv_comb)
        detection_tpr_fpr05_comb, _ = tpr_at_fpr(s_clean_comb,
                                                 s_adv_comb, 0.05)
        undetected_success, _ = undetected_success_rate(
            errs_clean, errs_adv, ~defended_correct_adv)
        undetected_success_2s, _ = undetected_success_rate(
            s_clean_2s, s_adv_2s, ~defended_correct_adv)
        undetected_success_comb, _ = undetected_success_rate(
            s_clean_comb, s_adv_comb, ~defended_correct_adv)
        print(f"transfer-attack detection by rec error: AUC "
              f"{detection_auc:.4f} (two-sided {detection_auc_2s:.4f}, "
              f"two-feature {detection_auc_comb:.4f}), "
              f"detection rate {detection_tpr_fpr05:.4f} @ 5% FPR; "
              f"undetected successful attacks {undetected_success:.4f} "
              f"one-sided / {undetected_success_2s:.4f} two-sided / "
              f"{undetected_success_comb:.4f} two-feature")
        if args.detect_save:
            ensure_dir(os.path.dirname(args.detect_save) or ".")
            meta = {"dataset": cfg.type, "script": "blackbox",
                    "bb_model": args.bb_model, "sub_model": args.sub_model,
                    "attack": "fgsm_transfer", "defense": args.defense_type,
                    "fgsm_eps": args.fgsm_eps, "data_aug": args.data_aug,
                    "lmbda": args.lmbda,
                    "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters}
            np.savez(args.detect_save,
                     errs_clean=errs_clean, errs_adv=errs_adv,
                     margins_clean=marg_clean, margins_adv=marg_adv,
                     all_losses_clean=feats_clean.all_losses,
                     all_losses_adv=feats_adv.all_losses,
                     defended_correct_adv=np.asarray(defended_correct_adv,
                                                     bool),
                     meta=json.dumps(meta))
            print("saved per-example detection statistics to "
                  f"{args.detect_save}")

    ensure_dir(args.results_dir)
    record = {
        "script": "blackbox", "dataset": cfg.type,
        "bb_model": args.bb_model, "sub_model": args.sub_model,
        "defense": args.defense_type, "fgsm_eps": args.fgsm_eps,
        "data_aug": args.data_aug, "lmbda": args.lmbda,
        "train_on_recs": args.train_on_recs,
        "sub_from_scratch": args.sub_from_scratch,
        "num_tests": int(x_eval.shape[0]),
        "clean_acc": clean_acc, "sub_agreement": agree,
        "clean_defended_acc": clean_defended_acc,
        "adv_acc_no_defense": adv_acc, "defended_acc": defended_acc,
        "detection_auc": detection_auc,
        "detection_tpr_at_fpr05": detection_tpr_fpr05,
        "detection_auc_two_sided": detection_auc_2s,
        "detection_tpr_at_fpr05_two_sided": detection_tpr_fpr05_2s,
        "detection_auc_combined": detection_auc_comb,
        "detection_tpr_at_fpr05_combined": detection_tpr_fpr05_comb,
        "undetected_success_rate": undetected_success,
        "undetected_success_rate_two_sided": undetected_success_2s,
        "undetected_success_rate_combined": undetected_success_comb,
        "rec_err_clean_mean": rec_err_clean,
        "rec_err_adv_mean": rec_err_adv,
        "phases": timer.summary(),
    }
    print(f"phase breakdown: {timer}")
    append_jsonl(os.path.join(args.results_dir, "blackbox.jsonl"), record)
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
