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
    args = ap.parse_args(argv)
    if args.out:
        ensure_dir(os.path.dirname(args.out) or ".")
    for path in args.npz:
        analyze(path, args.fpr, args.subsets, args.out)
        print()


if __name__ == "__main__":
    main()
