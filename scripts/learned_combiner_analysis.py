#!/usr/bin/env python
"""Learned joint combiners over the saved detection features — host-side.

The round-5 ledger measured features (margin, dispersion), combiners
(max vs sum vs Fisher), variance (K-pass averaging) and stability
(K-pass voting) against the tailored attacks; the residual leaks
(flagship confident-SPSA ~23%, digits confident ~22%, digits CW ~5%)
were declared structural FOR THE MAX COMBINER. This script measures the
one untried lever: a LEARNED 2-D decision over the per-feature ECDF
scores, which can express joint signatures max cannot — in particular
the centered attacks' "rec-err suspiciously dead-on-median AND margin
moderately low" region (clean mass there is ~ the product of the
marginals; the attack concentrates in it).

Detectors, per saved cell (detstats npz from whitebox --detect_save):
  max2f      max(two-sided rec-err score, low-tail margin score) —
             the shipped baseline (eval/detect.py::combined_scores).
  knn        one-class joint atypicality: distance to the k-th nearest
             clean calibration point in (u_err, u_margin) ECDF space,
             leave-one-out on clean. Attack-independent (needs no
             adversarial data), like max.
  lofo-lr    logistic regression on [s_err, s_margin, u_err, u_margin,
             s_err*s_margin], trained on the OTHER attack families of
             the same dataset (clean=0, adv=1), evaluated on the
             held-out family — the deployable supervised claim.
  oracle-lr  same model trained on the eval cell itself — the in-sample
             upper bound (NOT deployable; bounds what 2-D separation
             exists at all).

  margin     low-tail purified-margin score alone — the predicted
             detector FLOOR once an attacker disperses its rec-err
             center (the err feature then carries no information).
  xfer-lr    (dispersed cells only) the oracle trained on the SAME
             dataset's fixed-center confident cells, evaluated on the
             dispersed set — pre-registered prediction 2: its win
             evaporates because its dominant negative-s_err
             coefficient fires on clean-typical err scores the
             dispersed attack now shares.

Metrics: AUC, TPR@5% FPR, joint undetected-success rate. Calibration is
the cell's own clean set (in-sample), matching the published whitebox
--detect convention so rows are comparable with RESULTS.md; the same
bias applies to every detector column equally.

Usage:
  python scripts/learned_combiner_analysis.py [--fpr 0.05] [--k 10]
      [--dir output/detstats] [--out output/results/learned_combiner.jsonl]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402

from defensegan_tpu.eval import (ecdf_atypicality, roc_auc, tpr_at_fpr,  # noqa: E402
                                 undetected_success_rate)

# Canonical K=1 cells with margin features, grouped by dataset, tagged
# with an attack FAMILY for leave-one-family-out training (EOT-CW counts
# as the cw family: it is the same gradient attack, key-aware).
CELLS = {
    "flagship": [
        ("flagship_spsa_l300.npz", "spsa_centered"),
        ("flagship_conf_l300.npz", "spsa_confident"),
        ("flagship_conf_k25_l300.npz", "spsa_confident"),
        ("flagship_conf_l30.npz", "spsa_confident_weak"),
        ("flagship_cw_2f.npz", "cw"),
        ("flagship_conf_disp.npz", "spsa_confident_disp"),
    ],
    "digits": [
        ("digits_spsa_l6000_eq.npz", "spsa_centered"),
        ("digits_conf_l6000.npz", "spsa_confident"),
        ("digits_cw_3f.npz", "cw"),
        ("digits_cw_eot3.npz", "cw"),
    ],
    "fmnist": [
        ("fmnist_spsa.npz", "spsa_plain"),
    ],
}


def _load_cell(path):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    return {
        "errs_clean": z["errs_clean"].astype(np.float64),
        "errs_adv": z["errs_adv"].astype(np.float64),
        "margins_clean": z["margins_clean"].astype(np.float64),
        "margins_adv": z["margins_adv"].astype(np.float64),
        "wrong_adv": ~z["defended_correct_adv"].astype(bool),
        "meta": meta,
    }


def _features(errs, margins, errs_calib, margins_calib):
    """Per-image feature vector in ECDF space vs clean calibration."""
    s_err = ecdf_atypicality(errs, errs_calib, "two_sided")
    s_marg = ecdf_atypicality(margins, margins_calib, "low")
    # raw midrank positions (u in [0,1]) carry WHERE in the distribution
    # the value sits, which the folded scores discard
    u_err = 1.0 - ecdf_atypicality(errs, errs_calib, "low")
    u_marg = 1.0 - ecdf_atypicality(margins, margins_calib, "low")
    return np.stack([s_err, s_marg, u_err, u_marg, s_err * s_marg], axis=1)


def _knn_scores(F_eval, F_calib, k, loo=False):
    """Distance to the k-th nearest calibration point in (u_err, u_marg)."""
    pts_e = F_eval[:, 2:4]
    pts_c = F_calib[:, 2:4]
    d = np.sqrt(((pts_e[:, None, :] - pts_c[None, :, :]) ** 2).sum(-1))
    if loo:
        np.fill_diagonal(d, np.inf)
    return np.sort(d, axis=1)[:, k - 1]


def _lr_fit(F, y):
    from sklearn.linear_model import LogisticRegression
    m = LogisticRegression(max_iter=2000)
    m.fit(F, y)
    return m


def _row(name, s_clean, s_adv, wrong_adv, fpr):
    auc = roc_auc(s_clean, s_adv)
    tpr, _ = tpr_at_fpr(s_clean, s_adv, fpr)
    joint, _ = undetected_success_rate(s_clean, s_adv, wrong_adv,
                                       max_fpr=fpr)
    print(f"    {name:<12} AUC {auc:.3f}  TPR@{fpr:.0%} {tpr:.3f}  "
          f"joint undetected {joint:.3f}")
    return {"detector": name, "auc": auc, "tpr_at_fpr": tpr,
            "joint_undetected": joint}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default="output/detstats")
    ap.add_argument("--fpr", type=float, default=0.05)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    records = []
    for ds, cells in CELLS.items():
        loaded = []
        for fname, family in cells:
            path = os.path.join(args.dir, fname)
            if not os.path.exists(path):
                print(f"[skip] {path} absent")
                continue
            c = _load_cell(path)
            c["file"], c["family"] = fname, family
            c["F_clean"] = _features(c["errs_clean"], c["margins_clean"],
                                     c["errs_clean"], c["margins_clean"])
            c["F_adv"] = _features(c["errs_adv"], c["margins_adv"],
                                   c["errs_clean"], c["margins_clean"])
            loaded.append(c)
        if not loaded:
            continue
        print(f"\n=== {ds} ({len(loaded)} cells)")
        for c in loaded:
            print(f"\n  {c['file']}  [{c['family']}]  "
                  f"n_adv={len(c['errs_adv'])}  "
                  f"wrong={c['wrong_adv'].mean():.3f}")
            rows = []
            # baseline: shipped max combiner
            rows.append(_row("max2f",
                             np.maximum(c["F_clean"][:, 0], c["F_clean"][:, 1]),
                             np.maximum(c["F_adv"][:, 0], c["F_adv"][:, 1]),
                             c["wrong_adv"], args.fpr))
            # margin alone: the predicted floor under center dispersion
            rows.append(_row("margin",
                             c["F_clean"][:, 1], c["F_adv"][:, 1],
                             c["wrong_adv"], args.fpr))
            # one-class joint kNN (attack-independent)
            rows.append(_row("knn",
                             _knn_scores(c["F_clean"], c["F_clean"], args.k,
                                         loo=True),
                             _knn_scores(c["F_adv"], c["F_clean"], args.k),
                             c["wrong_adv"], args.fpr))
            # leave-one-family-out logistic regression
            train = [o for o in loaded if o["family"] != c["family"]]
            if train:
                F_tr = np.concatenate([o["F_clean"] for o in train]
                                      + [o["F_adv"] for o in train])
                y_tr = np.concatenate(
                    [np.zeros(len(o["F_clean"])) for o in train]
                    + [np.ones(len(o["F_adv"])) for o in train])
                m = _lr_fit(F_tr, y_tr)
                rows.append(_row("lofo-lr",
                                 m.predict_proba(c["F_clean"])[:, 1],
                                 m.predict_proba(c["F_adv"])[:, 1],
                                 c["wrong_adv"], args.fpr))
            # transfer: the fixed-center-trained oracle pointed at the
            # dispersed counter-attack (pre-registered prediction 2)
            if c["family"] == "spsa_confident_disp":
                src = [o for o in loaded if o["family"] == "spsa_confident"]
                if src:
                    F_tr = np.concatenate([o["F_clean"] for o in src]
                                          + [o["F_adv"] for o in src])
                    y_tr = np.concatenate(
                        [np.zeros(len(o["F_clean"])) for o in src]
                        + [np.ones(len(o["F_adv"])) for o in src])
                    m = _lr_fit(F_tr, y_tr)
                    rows.append(_row("xfer-lr",
                                     m.predict_proba(c["F_clean"])[:, 1],
                                     m.predict_proba(c["F_adv"])[:, 1],
                                     c["wrong_adv"], args.fpr))
            # oracle: in-sample upper bound
            F_tr = np.concatenate([c["F_clean"], c["F_adv"]])
            y_tr = np.concatenate([np.zeros(len(c["F_clean"])),
                                   np.ones(len(c["F_adv"]))])
            m = _lr_fit(F_tr, y_tr)
            rows.append(_row("oracle-lr",
                             m.predict_proba(c["F_clean"])[:, 1],
                             m.predict_proba(c["F_adv"])[:, 1],
                             c["wrong_adv"], args.fpr))
            print("    oracle coef [s_err,s_marg,u_err,u_marg,s*s]: "
                  + np.array2string(m.coef_[0], precision=2))
            rows[-1]["coef"] = [float(v) for v in m.coef_[0]]
            records.append({"dataset": ds, "file": c["file"],
                            "family": c["family"], "fpr": args.fpr,
                            "rows": rows, "meta": c["meta"]})
    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
