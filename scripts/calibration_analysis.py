#!/usr/bin/env python
"""Detector calibration analysis — host-side, no device work.

Consumes per-example detection statistics saved by
`whitebox.py --detect --detect_save out.npz` and answers the two
operational questions the aggregate AUC rows can't:

  1. statistical confidence: percentile-bootstrap CIs for the one- and
     two-sided AUC (is 0.83 on 256 examples different from 0.75?);
  2. calibration-set sizing: DefendedPipeline.calibrate() fits the
     detector threshold on a finite clean sample — per candidate size n,
     the sweep subsamples n clean errors, fits center+threshold exactly
     as the pipeline does, and reports the realized FPR (held-out clean)
     and TPR (adversarial) spread over resamples. The smallest n whose
     realized FPR concentrates at the target is what an operator needs.

Usage:
  python scripts/calibration_analysis.py --npz out1.npz [out2.npz ...]
      [--fpr 0.05] [--sizes 16 32 64 128] [--trials 200] [--boot 1000]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

from defensegan_tpu.eval import (bootstrap_auc_ci, calibration_sweep,  # noqa: E402
                                 combined_scores, roc_auc,
                                 two_sided_scores)


def analyze(path, fpr, sizes, trials, boot):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    clean = data["errs_clean"]
    adv = data["errs_adv"]
    label = (f"{meta.get('dataset')}/{meta.get('attack')}"
             + (f" λ={meta['pgd_rec_penalty']:g}"
                if meta.get("pgd_rec_penalty") else ""))
    print(f"\n== {label}  ({os.path.basename(path)}; n_clean={clean.size}, "
          f"n_adv={adv.size})")

    auc_1s = roc_auc(clean, adv)
    lo1, hi1 = bootstrap_auc_ci(clean, adv, n_boot=boot)
    s_clean = two_sided_scores(clean, clean)
    s_adv = two_sided_scores(adv, clean)
    auc_2s = roc_auc(s_clean, s_adv)
    lo2, hi2 = bootstrap_auc_ci(s_clean, s_adv, n_boot=boot)
    print(f"AUC one-sided {auc_1s:.3f} [{lo1:.3f}, {hi1:.3f}]  "
          f"two-sided {auc_2s:.3f} [{lo2:.3f}, {hi2:.3f}]  (95% bootstrap)")

    # two-feature stats when the npz carries margins (newer detect_save)
    auc_comb = ci_comb = None
    have_margins = ("margins_clean" in data.files
                    and "margins_adv" in data.files)
    if have_margins:
        sc_comb = combined_scores(clean, data["margins_clean"],
                                  clean, data["margins_clean"])
        sa_comb = combined_scores(adv, data["margins_adv"],
                                  clean, data["margins_clean"])
        auc_comb = roc_auc(sc_comb, sa_comb)
        ci_comb = list(bootstrap_auc_ci(sc_comb, sa_comb, n_boot=boot))
        print(f"AUC two-feature (rec err + purified margin) "
              f"{auc_comb:.3f} [{ci_comb[0]:.3f}, {ci_comb[1]:.3f}]")

    sizes = tuple(n for n in sizes if n < clean.size)
    sweeps = {}
    plans = [("two_sided", {})]
    if have_margins:
        plans.append(("combined",
                      dict(margins_clean=data["margins_clean"],
                           margins_adv=data["margins_adv"])))
    for det, extra in plans:
        rows = calibration_sweep(clean, adv, detector=det, fpr=fpr,
                                 sizes=sizes, trials=trials, **extra)
        sweeps[det] = rows
        print(f"calibration sweep ({det}, target FPR {fpr:.0%}, "
              f"{trials} resamples):")
        print(f"{'calib_n':>8} {'FPR mean':>9} {'FPR p90':>8} "
              f"{'TPR mean':>9} {'TPR std':>8}")
        for r in rows:
            print(f"{r['calib_n']:>8} {r['fpr_mean']:>9.3f} "
                  f"{r['fpr_p90']:>8.3f} {r['tpr_mean']:>9.3f} "
                  f"{r['tpr_std']:>8.3f}")
    return {"set": label, "file": os.path.basename(path),
            "auc_one_sided": auc_1s, "auc_one_sided_ci": [lo1, hi1],
            "auc_two_sided": auc_2s, "auc_two_sided_ci": [lo2, hi2],
            "auc_combined": auc_comb, "auc_combined_ci": ci_comb,
            "sweep": sweeps["two_sided"],
            "sweep_combined": sweeps.get("combined"), "meta": meta}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npz", nargs="+", required=True,
                    help="files from whitebox.py --detect_save")
    ap.add_argument("--fpr", type=float, default=0.05)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--boot", type=int, default=1000)
    ap.add_argument("--out", default=None,
                    help="write the analysis records as JSONL here")
    args = ap.parse_args(argv)
    records = [analyze(p, args.fpr, args.sizes, args.trials, args.boot)
               for p in args.npz]
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
