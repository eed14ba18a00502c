#!/usr/bin/env python
"""Encoder-init frontier: quality / robustness / throughput vs (R, L, init).

The amortized-inversion encoder (defense/encoder_init.py; no reference
equivalent) claims the projection can run at far smaller (R, L) from an
encoder start without giving up defense quality. This script MEASURES that
claim as a grid of operating points; the serving decision rides these rows
(RESULTS.md round 5).

Legs:
  train      train the encoder for --cfg against the frozen generator
             (checkpointed under <output_dir>/encoder/).
  frontier   per (R, L) x init cell, on --num_tests held-out test images:
             - clean defended accuracy (purify -> classifier)
             - FGSM(eps)-through-defense defended accuracy: the attack
               differentiates through the encoder AND the unrolled
               projection of the SAME deployed cell config (exact grad,
               attacks/compose.py honors cfg.rec_init)
             - detection at the cell config: rec-err two-sided AUC +
               two-feature AUC + joint undetected rate (in-sample clean
               calibration, same convention as whitebox --detect rows)
             - projection wall-clock -> reconstructions/s (2nd pass, warm)

Usage:
  python scripts/encoder_exp.py --cfg output/gans/mnist_fast --model A \
      --legs train frontier --grid 10x200 2x50 1x25 \
      --inits random encoder encoder_jitter
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def get_or_train_classifier(cfg, model_name, x_train, y_train, epochs=10):
    """whitebox.py::get_classifier's cache layout, minus the attack-CLI
    coupling (same tag => same cached weights the whitebox cells use)."""
    import jax

    from defensegan_tpu.ckpt import save_checkpoint
    from defensegan_tpu.eval.classifier import (load_cached_classifier,
                                                train_classifier)
    from defensegan_tpu.models import build_classifier

    model = build_classifier(model_name, num_classes=cfg.num_classes)
    tag = f"{cfg.type}_model{model_name}"
    cached = load_cached_classifier(tag, model, cfg.image_shape)
    if cached is not None:
        print(f"loaded classifier {tag}")
        return cached
    print(f"training classifier {tag} ({epochs} epochs)")
    state = train_classifier(model, x_train, y_train,
                             key=jax.random.key(7), epochs=epochs)
    save_checkpoint(os.path.join("output", "classifiers", tag), 0,
                    state.params)
    return state


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--model", default="A")
    ap.add_argument("--legs", nargs="+", default=["frontier"],
                    choices=["train", "frontier"])
    ap.add_argument("--grid", nargs="+",
                    default=["10x200", "4x100", "2x50", "1x25"],
                    help="RxL cells, e.g. 10x200 2x50")
    ap.add_argument("--inits", nargs="+",
                    default=["random", "encoder", "encoder_jitter"])
    ap.add_argument("--num_tests", type=int, default=256)
    ap.add_argument("--fgsm_eps", type=float, default=0.3)
    ap.add_argument("--attack_batch", type=int, default=128)
    ap.add_argument("--encoder_iters", type=int, default=None)
    ap.add_argument("--noise_aug", type=float, default=None,
                    help="override cfg ENCODER_NOISE_AUG for the train leg")
    ap.add_argument("--skip_attack", action="store_true",
                    help="frontier: clean quality + throughput only")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from defensegan_tpu.attacks import make_attack_target
    from defensegan_tpu.attacks.compose import attack_batch_key
    from defensegan_tpu.attacks.fgsm import fgsm
    from defensegan_tpu.cli.common import load_data, load_gan
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.eval.accuracy import model_eval
    from defensegan_tpu.eval.detect import (combined_scores,
                                            detection_features, roc_auc,
                                            two_sided_scores,
                                            undetected_success_rate)
    from defensegan_tpu.utils.misc import append_jsonl, ensure_dir

    cfg = load_config(args.cfg)
    gan = load_gan(cfg, require_trained=True)
    ds = load_data(cfg)
    x_train, y_train = ds.load("train")
    x_test, y_test = ds.load("test")
    x_test, y_test = x_test[:args.num_tests], y_test[:args.num_tests]

    ensure_dir(args.results_dir)
    out_path = os.path.join(args.results_dir, "encoder_exp.jsonl")

    if "train" in args.legs:
        kw = {}
        if args.noise_aug is not None:
            kw["noise_aug"] = args.noise_aug
        t0 = time.time()
        m = gan.train_encoder(x_train, iters=args.encoder_iters, **kw)
        row = {"script": "encoder_exp", "leg": "train",
               "dataset": cfg.type,
               "iters": args.encoder_iters or cfg.encoder_train_iters,
               "noise_aug": (args.noise_aug if args.noise_aug is not None
                             else cfg.encoder_noise_aug),
               "beta_z": cfg.encoder_beta_z,
               "img_mse": round(m["img_mse"], 6),
               "z_cycle": round(m["z_cycle"], 5),
               "wall_s": round(time.time() - t0, 1),
               "gen_step": int(gan.state.step)}
        append_jsonl(out_path, row)
        print(json.dumps(row), flush=True)

    if "frontier" not in args.legs:
        return

    clf = get_or_train_classifier(cfg, args.model, x_train, y_train)
    logits_fn = clf.logits_fn()
    clean_acc = model_eval(logits_fn, x_test, y_test)
    print(f"bare classifier clean acc: {clean_acc:.4f}")

    need_encoder = any(i != "random" for i in args.inits)
    if need_encoder and not gan.has_encoder():
        raise SystemExit("no trained encoder — run the train leg first")

    rows = []
    for cell in args.grid:
        rr, iters = (int(v) for v in cell.split("x"))
        for init in args.inits:
            key = jax.random.key(11)

            def feats(x, k):
                return detection_features(gan, x, logits_fn, key=k,
                                          rec_rr=rr, rec_iters=iters,
                                          rec_init=init)

            # --- clean pass (warm) + timed second pass -> recon/s
            f_clean = feats(x_test, jax.random.fold_in(key, 0))
            t0 = time.time()
            f_clean = feats(x_test, jax.random.fold_in(key, 0))
            wall = time.time() - t0
            recon_s = round(x_test.shape[0] / wall, 1)
            clean_def_acc = float(np.mean(f_clean.preds ==
                                          np.asarray(y_test)))

            row = {"script": "encoder_exp", "leg": "frontier",
                   "dataset": cfg.type, "model": args.model,
                   "rec_rr": rr, "rec_iters": iters, "rec_init": init,
                   "num_tests": int(x_test.shape[0]),
                   "clean_acc": round(clean_acc, 4),
                   "clean_defended_acc": round(clean_def_acc, 4),
                   "rec_err_clean_mean": round(float(
                       np.mean(f_clean.errs)), 6),
                   "margin_clean_mean": round(float(
                       np.mean(f_clean.margins)), 3),
                   "recon_per_s": recon_s}

            if not args.skip_attack:
                # FGSM through the DEPLOYED cell config (exact grad,
                # encoder included when init=encoder*)
                cfg_cell = cfg.replace(rec_rr=rr, rec_iters=iters,
                                       rec_init=init)
                target = make_attack_target(gan, logits_fn, cfg_cell)
                k_att = jax.random.key(23)

                @jax.jit
                def craft(xb, yb, k):
                    return fgsm(lambda x: target(x, k), xb, yb,
                                args.fgsm_eps)

                advs = []
                t0 = time.time()
                for lo in range(0, x_test.shape[0], args.attack_batch):
                    hi = min(lo + args.attack_batch, x_test.shape[0])
                    advs.append(np.asarray(craft(
                        jnp.asarray(x_test[lo:hi]),
                        jnp.asarray(y_test[lo:hi]),
                        attack_batch_key(k_att, lo))))
                x_adv = np.concatenate(advs)
                craft_s = time.time() - t0

                adv_acc_bare = model_eval(logits_fn, x_adv, y_test)
                f_adv = feats(x_adv, jax.random.fold_in(key, 1))
                def_acc = float(np.mean(f_adv.preds == np.asarray(y_test)))
                auc_2s = roc_auc(
                    two_sided_scores(f_clean.errs, f_clean.errs),
                    two_sided_scores(f_adv.errs, f_clean.errs))
                s_clean = combined_scores(f_clean.errs, f_clean.margins,
                                          f_clean.errs, f_clean.margins)
                s_adv = combined_scores(f_adv.errs, f_adv.margins,
                                        f_clean.errs, f_clean.margins)
                auc_2f = roc_auc(s_clean, s_adv)
                joint_2f, _ = undetected_success_rate(
                    s_clean, s_adv, f_adv.preds != np.asarray(y_test))
                row.update({
                    "fgsm_eps": args.fgsm_eps,
                    "adv_acc_no_defense": round(adv_acc_bare, 4),
                    "defended_acc": round(def_acc, 4),
                    "rec_err_adv_mean": round(float(
                        np.mean(f_adv.errs)), 6),
                    "detection_auc_two_sided": round(auc_2s, 4),
                    "detection_auc_combined": round(auc_2f, 4),
                    "undetected_success_combined": round(float(joint_2f),
                                                         4),
                    "craft_s": round(craft_s, 1)})

            rows.append(row)
            append_jsonl(out_path, row)
            print(json.dumps(row), flush=True)

    hdr = (f"{'R x L':>8} {'init':>15} {'clean-def':>9} {'recon/s':>8}"
           + ("" if args.skip_attack else
              f" {'fgsm-def':>8} {'AUC2f':>6} {'joint':>6}"))
    print("\n" + hdr)
    for r in rows:
        line = (f"{r['rec_rr']}x{r['rec_iters']:>4} {r['rec_init']:>15} "
                f"{r['clean_defended_acc']:>9.3f} {r['recon_per_s']:>8.1f}")
        if not args.skip_attack:
            line += (f" {r['defended_acc']:>8.3f} "
                     f"{r['detection_auc_combined']:>6.3f} "
                     f"{r['undetected_success_combined']:>6.3f}")
        print(line)


if __name__ == "__main__":
    main()
