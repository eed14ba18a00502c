#!/usr/bin/env python
"""Serving-pipeline operational evaluation (DefendedPipeline).

Pushes whitebox-crafted adversarial sets (whitebox.py --save_adv) through
the deployment object defense/pipeline.py::DefendedPipeline — calibrated
on held-out CLEAN data only — and reports what an operator actually
ships: per attack set, the flag rate, the accuracy on unflagged inputs,
and the undetected-success rate P(misclassified AND unflagged). Crafting
stays single-sourced in cli/whitebox.py; this script only measures the
serving surface.

Calibration uses the TRAIN tail (digits test is only 297 images and the
first 256 are the attack-eval slice): the detector needs the clean
rec-err distribution, which train-tail images represent; they were seen
by the GAN/classifier, so clean flag rates here are the optimistic leg —
the paired clean rows report the eval slice too.

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
                    choices=["two_sided", "one_sided", "combined"])
    ap.add_argument("--calib_n", type=int, default=256)
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)

    from defensegan_tpu.cli.common import load_data, load_gan
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.defense import DefendedPipeline
    from defensegan_tpu.eval.classifier import load_cached_classifier
    from defensegan_tpu.models import build_classifier
    from defensegan_tpu.utils.misc import append_jsonl, ensure_dir

    cfg = load_config(args.cfg)
    gan = load_gan(cfg, require_trained=True)
    ds = load_data(cfg)
    x_train, _ = ds.load("train")

    tag = f"{cfg.type}_model{args.model}"
    model = build_classifier(args.model, num_classes=cfg.num_classes)
    clf = load_cached_classifier(tag, model, cfg.image_shape)
    if clf is None:
        raise SystemExit(f"no cached classifier for {tag} — run the "
                         "matching whitebox cell first (it trains + caches)")
    logits_fn = clf.logits_fn()
    print(f"loaded classifier {tag}")

    x_calib = x_train[-args.calib_n:]
    pipe = DefendedPipeline(gan, logits_fn, fpr=args.fpr,
                            detector=args.detector)
    pipe.calibrate(x_calib, key=jax.random.key(101))
    print(f"calibrated {args.detector} detector on {len(x_calib)} clean "
          f"train-tail images @ {args.fpr:.0%} FPR "
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
            "calib_n": args.calib_n, "n": int(len(y)),
            "rec_rr": cfg.rec_rr, "rec_iters": cfg.rec_iters,
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
