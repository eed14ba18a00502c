#!/usr/bin/env python
"""K-pass detection sweep — host-side, no device work.

Consumes detstats npz files from `whitebox.py --detect --detect_passes K
--detect_save` that carry the per-pass feature arrays ([K, N]
errs_{clean,adv}_pp / margins_{clean,adv}_pp, saved since round 5) and
answers the round-5 variance question: the detection-aware attacker
optimizes the EXPECTED detector statistics over projection keys, so
averaging K independent detection passes concentrates both classes
~sqrt(K) around means the attack could only partially move — how fast
does the joint undetected-success rate fall in K?

Per npz and per K' in 1..K it reports, for each detector in
{rec-err two-sided, margin low-tail, 2-feature max}: AUC, TPR@5% FPR,
and the joint undetected-success rate, averaged over `--subsets` random
K'-subsets of the saved passes (passes are exchangeable — the craft run
never saw any of these keys). The K'=K row is deterministic (the full
average, the number a K-pass deployment realizes); K'=1 mean is the
single-pass baseline matching the plain --detect rows.

Calibration note: ECDF/median calibration is recomputed from the
K'-averaged CLEAN features per subset — exactly what a K'-pass
deployment calibrates on.

Usage:
  python scripts/kpass_analysis.py --npz output/detstats/*_k8.npz
      [--fpr 0.05] [--subsets 20] [--out rows.jsonl]
"""

import argparse
import itertools
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

from defensegan_tpu.eval import (combined_scores, ecdf_atypicality,  # noqa: E402
                                 roc_auc, tpr_at_fpr, two_sided_scores,
                                 undetected_success_rate)
from defensegan_tpu.utils.misc import append_jsonl, ensure_dir  # noqa: E402


def _detectors(ec, ea, mc, ma):
    """Score the three detectors from K'-averaged features.

    Returns {name: (scores_clean, scores_adv)} with calibration taken
    from the averaged clean features (deployment-faithful).
    """
    return {
        "two_sided": (two_sided_scores(ec, ec), two_sided_scores(ea, ec)),
        "margin": (ecdf_atypicality(mc, mc, "low"),
                   ecdf_atypicality(ma, mc, "low")),
        "combined": (combined_scores(ec, mc, ec, mc),
                     combined_scores(ea, ma, ec, mc)),
    }


# majority vote lives in eval/detect.py (shared with DefendedPipeline's
# vote=True serving mode); re-exported here for the offline analysis
from defensegan_tpu.eval.detect import majority_vote as _majority_vote  # noqa: E402


def analyze_vote(path, fpr, n_subsets, out):
    """K-pass VOTE analysis: the other use of K projection passes.

    Feature averaging (the default analysis) null-resulted in round 5 —
    the tailored attacks sit inside the clean feature distribution in
    expectation. Voting asks a different question: is the attack's
    SUCCESS stable across projection keys? Per K' it reports the
    majority-vote defended accuracy (vs the saved single-pass
    defended_correct_adv baseline), the vote-disagreement detection AUC,
    and the joint undetected rate when disagreement joins the 2-feature
    max (success = majority vote wrong).
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    need = ("preds_clean_pp", "preds_adv_pp", "y")
    if any(k not in data for k in need):
        print(f"== {os.path.basename(path)}: no per-pass predictions "
              "(re-run the replay with --detect_passes K>1 after round-5's "
              "preds_pp addition); skipping vote analysis")
        return
    pc_pp, pa_pp, y = data["preds_clean_pp"], data["preds_adv_pp"], data["y"]
    ec_pp, ea_pp = data["errs_clean_pp"], data["errs_adv_pp"]
    mc_pp, ma_pp = data["margins_clean_pp"], data["margins_adv_pp"]
    k_total = pc_pp.shape[0]
    label = f"{meta.get('dataset')}/{meta.get('attack')}"
    base = None
    if "defended_correct_adv" in data:
        base = data["defended_correct_adv"].astype(bool).mean()
    print(f"== VOTE {label}  ({os.path.basename(path)})  K={k_total}, "
          f"N={pc_pp.shape[1]}"
          + ("" if base is None
             else f", single-pass defended acc {base:.3f}"))
    rng = np.random.default_rng(0)
    for k in range(1, k_total + 1):
        subs = _subsets(k_total, k, n_subsets, rng)
        accs, aucs, joints, joints_2f = [], [], [], []
        for idx in subs:
            vote_c, dis_c = _majority_vote(pc_pp[idx])
            vote_a, dis_a = _majority_vote(pa_pp[idx])
            accs.append((vote_a == y).mean())
            wrong = vote_a != y
            # disagreement alone (high side: adv flips more across keys)
            sc = ecdf_atypicality(dis_c, dis_c, "high")
            sa = ecdf_atypicality(dis_a, dis_c, "high")
            aucs.append(roc_auc(sc, sa))
            joint, _ = undetected_success_rate(sc, sa, wrong, max_fpr=fpr)
            joints.append(joint)
            # disagreement joined into the 2-feature max (K'-averaged
            # features + the vote-wrong success definition)
            ec, mc = ec_pp[idx].mean(0), mc_pp[idx].mean(0)
            ea, ma = ea_pp[idx].mean(0), ma_pp[idx].mean(0)
            sc3 = np.maximum(combined_scores(ec, mc, ec, mc), sc)
            sa3 = np.maximum(combined_scores(ea, ma, ec, mc), sa)
            joint3, _ = undetected_success_rate(sc3, sa3, wrong,
                                                max_fpr=fpr)
            joints_2f.append(joint3)
        row = {"npz": os.path.basename(path), "label": label, "k": k,
               "n_subsets": len(subs), "fpr": fpr, "analysis": "vote",
               "vote_defended_acc": float(np.mean(accs)),
               "vote_defended_acc_sd": float(np.std(accs)),
               "disagree_auc": float(np.mean(aucs)),
               "joint_undetected_disagree": float(np.mean(joints)),
               "joint_undetected_2f_plus_disagree":
                   float(np.mean(joints_2f)),
               "joint_sd": float(np.std(joints_2f))}
        print(f"  K={k} ({len(subs):2d} subsets): vote acc "
              f"{np.mean(accs):.3f}±{np.std(accs):.3f}  |  disagree AUC "
              f"{np.mean(aucs):.3f} joint {np.mean(joints):.3f}  |  "
              f"2f+disagree joint {np.mean(joints_2f):.3f}"
              f"±{np.std(joints_2f):.3f}")
        if out:
            append_jsonl(out, row)


def _subsets(k_total, k_sub, n_max, rng):
    """Up to n_max distinct index subsets of size k_sub from range(k_total)."""
    from math import comb
    total = comb(k_total, k_sub)
    if total <= n_max:
        return [np.array(c) for c in
                itertools.combinations(range(k_total), k_sub)]
    seen, out = set(), []
    while len(out) < n_max:
        c = tuple(sorted(rng.choice(k_total, size=k_sub, replace=False)))
        if c not in seen:
            seen.add(c)
            out.append(np.array(c))
    return out


def analyze(path, fpr, n_subsets, out):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if "errs_clean_pp" not in data:
        print(f"== {os.path.basename(path)}: no per-pass arrays "
              "(run --detect_passes K>1 with --detect_save); skipping")
        return
    ec_pp = data["errs_clean_pp"]   # [K, N]
    ea_pp = data["errs_adv_pp"]
    mc_pp = data["margins_clean_pp"]
    ma_pp = data["margins_adv_pp"]
    wrong = None
    if "defended_correct_adv" in data:
        wrong = ~data["defended_correct_adv"].astype(bool)
    k_total = ec_pp.shape[0]
    label = f"{meta.get('dataset')}/{meta.get('attack')}"
    print(f"== {label}  ({os.path.basename(path)})  K={k_total}, "
          f"N={ec_pp.shape[1]}, detect_passes meta="
          f"{meta.get('detect_passes')}")
    rng = np.random.default_rng(0)
    for k in range(1, k_total + 1):
        subs = _subsets(k_total, k, n_subsets, rng)
        acc = {}
        for idx in subs:
            feats = (ec_pp[idx].mean(0), ea_pp[idx].mean(0),
                     mc_pp[idx].mean(0), ma_pp[idx].mean(0))
            for name, (sc, sa) in _detectors(*feats).items():
                auc = roc_auc(sc, sa)
                tpr, _ = tpr_at_fpr(sc, sa, fpr)
                joint = None
                if wrong is not None:
                    joint, _ = undetected_success_rate(sc, sa, wrong,
                                                       max_fpr=fpr)
                acc.setdefault(name, []).append((auc, tpr, joint))
        row = {"npz": os.path.basename(path), "label": label, "k": k,
               "n_subsets": len(subs), "fpr": fpr}
        parts = []
        for name, vals in acc.items():
            arr = np.array([[a, t, j if j is not None else np.nan]
                            for a, t, j in vals], np.float64)
            mean = np.nanmean(arr, axis=0)
            sd = np.nanstd(arr, axis=0)
            row[name] = {"auc": float(mean[0]), "auc_sd": float(sd[0]),
                         "tpr_at_fpr": float(mean[1]),
                         "joint_undetected":
                             None if wrong is None else float(mean[2]),
                         "joint_sd":
                             None if wrong is None else float(sd[2])}
            parts.append(
                f"{name} AUC {mean[0]:.3f}±{sd[0]:.3f}"
                + ("" if wrong is None
                   else f" joint {mean[2]:.3f}±{sd[2]:.3f}"))
        print(f"  K={k} ({len(subs):2d} subsets): " + "  |  ".join(parts))
        if out:
            append_jsonl(out, row)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--npz", nargs="+", required=True)
    ap.add_argument("--fpr", type=float, default=0.05)
    ap.add_argument("--subsets", type=int, default=20,
                    help="max random K'-subsets per K' (exhaustive when "
                         "C(K,K') is smaller)")
    ap.add_argument("--out", default=None,
                    help="append per-(npz,K) JSONL rows here")
    ap.add_argument("--vote", action="store_true",
                    help="also run the K-pass VOTE analysis (majority-"
                         "vote accuracy + vote-disagreement detection; "
                         "needs preds_*_pp arrays in the npz)")
    args = ap.parse_args(argv)
    if args.out:
        ensure_dir(os.path.dirname(args.out) or ".")
    for path in args.npz:
        analyze(path, args.fpr, args.subsets, args.out)
        if args.vote:
            analyze_vote(path, args.fpr, args.subsets, args.out)
        print()


if __name__ == "__main__":
    main()
