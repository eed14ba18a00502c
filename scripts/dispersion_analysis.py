#!/usr/bin/env python
"""Restart-dispersion third-feature analysis — host-side, no device work.

Consumes detstats npz files from `whitebox.py --detect --detect_save`
that carry the per-restart final losses (all_losses_clean/adv [N, R],
saved since round 5) and answers VERDICT round-4 item 5: does adding a
restart-dispersion feature to the two-feature detector close the
remaining leaks (CW-on-digits ~5%) — and does it cost anything on the
cells the two-feature detector already wins?

Per npz it reports, for each detector in {rec-err 2s, margin-low,
2-feature, 3-feature(+dispersion)} x each dispersion kind:
AUC [bootstrap CI], TPR@5% FPR, and the joint undetected-success rate
(P(misclassified AND unflagged), needs defended_correct_adv).

Feature rationale (eval/detect.py::restart_dispersion): the projection
runs R independent z0 basins; the detector scores the winner. A
detection-aware attacker sculpts the winning loss onto the clean median,
but the R-1 losing basins are not directly optimized — their spread
relative to the winner is a side channel. Scored two-sided vs clean.

Usage:
  python scripts/dispersion_analysis.py --npz output/detstats/*.npz
      [--fpr 0.05] [--kinds rel_gap cv] [--boot 1000] [--out rows.jsonl]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

from defensegan_tpu.eval import (bootstrap_auc_ci, multi_feature_scores,  # noqa: E402
                                 restart_dispersion, roc_auc, tpr_at_fpr,
                                 undetected_success_rate)


def _detector_row(name, s_clean, s_adv, correct_adv, fpr, boot):
    auc = roc_auc(s_clean, s_adv)
    lo, hi = bootstrap_auc_ci(s_clean, s_adv, n_boot=boot)
    tpr, _ = tpr_at_fpr(s_clean, s_adv, fpr)
    joint = None
    if correct_adv is not None:
        joint, _ = undetected_success_rate(s_clean, s_adv, ~correct_adv,
                                           max_fpr=fpr)
    print(f"  {name:<28} AUC {auc:.3f} [{lo:.3f},{hi:.3f}]  "
          f"TPR@{fpr:.0%} {tpr:.3f}"
          + (f"  joint undetected {joint:.3f}" if joint is not None else ""))
    return {"detector": name, "auc": auc, "auc_ci": [lo, hi],
            "tpr_at_fpr": tpr, "joint_undetected": joint}


def analyze(path, fpr, kinds, boot):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    label = f"{meta.get('dataset')}/{meta.get('attack')}"
    print(f"\n== {label}  ({os.path.basename(path)})")
    if "all_losses_clean" not in data.files:
        print("  (no all_losses arrays — re-run the cell with the round-5 "
              "--detect_save to enable dispersion analysis)")
        return None
    errs_c, errs_a = data["errs_clean"], data["errs_adv"]
    marg_c, marg_a = data["margins_clean"], data["margins_adv"]
    al_c, al_a = data["all_losses_clean"], data["all_losses_adv"]
    correct = (data["defended_correct_adv"].astype(bool)
               if "defended_correct_adv" in data.files else None)

    rows = []
    base = [(errs_c, errs_c, "two_sided")]
    base_a = [(errs_a, errs_c, "two_sided")]
    marg = (marg_c, marg_c, "low")
    marg_a_t = (marg_a, marg_c, "low")
    rows.append(_detector_row(
        "rec-err two-sided", multi_feature_scores(base),
        multi_feature_scores(base_a), correct, fpr, boot))
    rows.append(_detector_row(
        "margin low-tail", multi_feature_scores([marg]),
        multi_feature_scores([marg_a_t]), correct, fpr, boot))
    rows.append(_detector_row(
        "2-feature (err+margin)", multi_feature_scores(base + [marg]),
        multi_feature_scores(base_a + [marg_a_t]), correct, fpr, boot))
    for kind in kinds:
        d_c = restart_dispersion(al_c, kind)
        d_a = restart_dispersion(al_a, kind)
        disp = (d_c, d_c, "two_sided")
        disp_a = (d_a, d_c, "two_sided")
        rows.append(_detector_row(
            f"dispersion[{kind}] alone", multi_feature_scores([disp]),
            multi_feature_scores([disp_a]), correct, fpr, boot))
        rows.append(_detector_row(
            f"3-feature (+{kind})",
            multi_feature_scores(base + [marg, disp]),
            multi_feature_scores(base_a + [marg_a_t, disp_a]),
            correct, fpr, boot))
    return {"set": label, "file": os.path.basename(path),
            "fpr": fpr, "rows": rows, "meta": meta}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npz", nargs="+", required=True)
    ap.add_argument("--fpr", type=float, default=0.05)
    ap.add_argument("--kinds", nargs="+", default=["rel_gap", "cv"],
                    choices=["rel_gap", "rel_spread", "cv"])
    ap.add_argument("--boot", type=int, default=1000)
    ap.add_argument("--out", default=None,
                    help="write the analysis records as JSONL here")
    args = ap.parse_args(argv)
    records = [r for p in args.npz
               if (r := analyze(p, args.fpr, args.kinds, args.boot))]
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
