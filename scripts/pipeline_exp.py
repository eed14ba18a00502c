#!/usr/bin/env python
"""Serving-pipeline operational evaluation (DefendedPipeline).

Pushes whitebox-crafted adversarial sets (whitebox.py --save_adv) through
the deployment object defense/pipeline.py::DefendedPipeline — calibrated
on held-out CLEAN data only — and reports what an operator actually
ships: per attack set, the flag rate, the accuracy on unflagged inputs,
and the undetected-success rate P(misclassified AND unflagged). Crafting
stays single-sourced in cli/whitebox.py; this script only measures the
serving surface.

Calibration source matters (round-4 finding): train-tail calibration
(--calib_source train_tail) produced a 23.4% clean flag rate at a 5% FPR
target for the combined detector on digits — train images were seen by
the GAN/classifier, so their purified margins sit HIGH, and the margin
ECDF's low tail lands far above the test distribution's (digits test has
~6% genuinely low-margin clean errors). The default is therefore
test_tail: held-out clean TEST images disjoint from the attack-eval
slice (digits: images [256:297] of the 297-image test set — small, but
drawn from the distribution the detector actually serves; the realized-
FPR noise at that size is quantified by eval/detect.py::calibration_sweep
and scripts/calibration_analysis.py).

Round-5 addendum: test_tail at digits' calib_n=41 measured a 26.6%
clean flag rate — consistent with the simulated small-n distribution
(random-41 calibration on the saved clean features: 7.6% +/- 4.9%,
max 28.8%) compounded by sklearn-digits' writer-ordering structure
(calibrating on the FIRST 41 of the eval head flags 24.7% of the rest).
--calib_source dev calibrates on the dev split instead (digits: 200
images, held out from GAN + classifier training AND from the attack
eval) — large enough that the simulated rate lands on target
(n=200: 5.3% +/- 3.3%). Use dev when the test tail is this small.

Usage:
  python scripts/pipeline_exp.py --cfg output/gans/digits --model A \
      --sets output/advsets/digits_fgsm.npz [more.npz ...] \
      [--fpr 0.05] [--detector two_sided] [--calib_n 256]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--model", default="A")
    ap.add_argument("--sets", nargs="+", required=True,
                    help="npz files from whitebox.py --save_adv")
    ap.add_argument("--fpr", type=float, default=0.05)
    ap.add_argument("--detector", default="two_sided",
                    choices=["two_sided", "one_sided", "combined", "combined3",
                             "margin"])
    ap.add_argument("--calib_n", type=int, default=256)
    ap.add_argument("--detect_passes", type=int, default=1,
                    help="K-pass detection: average the detector features "
                         "over K independent projection passes (the "
                         "round-5 variance lever; costs K passes/input)")
    ap.add_argument("--vote", action="store_true",
                    help="K-pass majority-vote prediction (needs "
                         "--detect_passes >= 2; recovers key-unstable "
                         "attack successes — measured +3.5pt defended "
                         "acc on CW-digits at K=8, RESULTS.md round 5)")
    ap.add_argument("--calib_source", default="test_tail",
                    choices=["test_tail", "train_tail", "dev"],
                    help="test_tail (default): clean TEST images AFTER "
                    "the attack-eval slice (serving-distribution "
                    "calibration; capped by what the test set has left); "
                    "dev: the dev split (held out from training AND the "
                    "eval slice — the right source when the test tail is "
                    "tiny, e.g. digits' 41); "
                    "train_tail: the round-4 protocol (optimistic margins "
                    "— kept for comparison rows)")
    ap.add_argument("--eval_slice_n", type=int, default=256,
                    help="size of the attack-eval slice at the head of "
                    "the test set (test_tail calibration starts after it)")
    ap.add_argument("--override", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="config overrides (any UPPERCASE YAML key) — e.g. "
                    "REC_RR=2 REC_ITERS=50 REC_INIT=encoder for the "
                    "amortized serving operating point")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)

    import yaml

    from defensegan_tpu.cli.common import load_data, load_gan
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.defense import DefendedPipeline
    from defensegan_tpu.eval.classifier import load_cached_classifier
    from defensegan_tpu.models import build_classifier
    from defensegan_tpu.utils.misc import append_jsonl, ensure_dir

    overrides = {}
    for kv in args.override:
        k, _, v = kv.partition("=")
        overrides[k.lower()] = yaml.safe_load(v)
    cfg = load_config(args.cfg, overrides)
    gan = load_gan(cfg, require_trained=True)
    ds = load_data(cfg)

    tag = f"{cfg.type}_model{args.model}"
    model = build_classifier(args.model, num_classes=cfg.num_classes)
    clf = load_cached_classifier(tag, model, cfg.image_shape)
    if clf is None:
        raise SystemExit(f"no cached classifier for {tag} — run the "
                         "matching whitebox cell first (it trains + caches)")
    logits_fn = clf.logits_fn()
    print(f"loaded classifier {tag}")

    if args.calib_source == "train_tail":
        x_train, _ = ds.load("train")
        x_calib = x_train[-args.calib_n:]
    elif args.calib_source == "dev":
        x_dev, _ = ds.load("dev")
        x_calib = x_dev[:args.calib_n]
    else:
        x_test, _ = ds.load("test")
        if len(x_test) <= args.eval_slice_n:
            raise SystemExit(
                f"test set has {len(x_test)} images, all inside the "
                f"attack-eval slice ({args.eval_slice_n}) — no held-out "
                "test images to calibrate on; use --calib_source "
                "train_tail or shrink --eval_slice_n")
        x_calib = x_test[args.eval_slice_n:
                         args.eval_slice_n + args.calib_n]
    pipe = DefendedPipeline(gan, logits_fn, fpr=args.fpr,
                            detector=args.detector,
                            detect_passes=args.detect_passes,
                            vote=args.vote)
    pipe.calibrate(x_calib, key=jax.random.key(101))
    print(f"calibrated {args.detector} detector on {len(x_calib)} clean "
          f"{args.calib_source} images @ {args.fpr:.0%} FPR "
          f"(center {pipe._center:.5f}, threshold {pipe._threshold:.5f})")

    ensure_dir(args.results_dir)
    out_path = os.path.join(args.results_dir, "pipeline.jsonl")

    def report(name, x, y, meta=None):
        out = pipe.predict(x, key=jax.random.key(202))
        correct = out.pred == y
        unflagged = ~out.flagged
        row = {
            "script": "pipeline_exp", "dataset": cfg.type,
            "model": args.model, "set": name,
            "detector": args.detector, "fpr": args.fpr,
            "calib_n": int(len(x_calib)),
            "calib_source": args.calib_source, "n": int(len(y)),
            "detect_passes": args.detect_passes,
            "vote": args.vote,
            "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters,
            "rec_init": cfg.rec_init,
            "flag_rate": float(out.flagged.mean()),
            "acc_all": float(correct.mean()),
            "acc_unflagged": (float(correct[unflagged].mean())
                              if unflagged.any() else None),
            "undetected_success_rate": float((~correct & unflagged).mean()),
            "rec_err_mean": float(out.rec_err.mean()),
            "margin_mean": float(out.margin.mean()),
            "meta": meta,
        }
        append_jsonl(out_path, row)
        print(json.dumps(row))
        return row

    first = np.load(args.sets[0], allow_pickle=False)
    report("clean", first["x_clean"], first["y"])
    for path in args.sets:
        d = np.load(path, allow_pickle=False)
        meta = json.loads(str(d["meta"]))
        name = os.path.splitext(os.path.basename(path))[0]
        report(name, d["x_adv"], d["y"], meta)


if __name__ == "__main__":
    main()
