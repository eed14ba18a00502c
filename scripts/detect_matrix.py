#!/usr/bin/env python
"""Render the defense-in-depth matrix from the results JSONL records.

Reads output/results/{whitebox,blackbox,pipeline}.jsonl and renders the
detection / joint-metric tables (markdown) that RESULTS.md's arms-race
sections are built from — one mechanical source for the numbers instead
of hand-transcription. Rows without detection fields (plain robustness
runs) are skipped; re-runs of the same cell are deduplicated with the
LAST (most recent) row winning, keyed on the attack-strength settings
that define the cell (same discipline as scripts/parity.py resume keys).

Usage: python scripts/detect_matrix.py [--results_dir output/results]
       [--dataset d ...] [--out FILE]
"""

import argparse
import json
import os
import sys


def _load(path):
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _fmt(v, digits=3):
    if v is None:
        return "—"
    return f"{v:.{digits}f}"


def _lam(row):
    """Attack label incl. the detection-aware knobs."""
    a = row.get("attack", "?")
    if a == "pgd":
        a += f"/{row.get('attack_grad', '?')}"
        lam = row.get("pgd_rec_penalty")
        if lam:
            cen = row.get("pgd_rec_center")
            a += f" λ={lam:g}" + (f" c={cen:g}" if cen is not None else "")
    elif a == "spsa":
        if row.get("spsa_objective") == "confident":
            kappa = row.get("spsa_margin_kappa")
            a += " CONF" + (f" κ={kappa:g}" if kappa is not None else "")
        it, ns = row.get("spsa_iters"), row.get("spsa_samples")
        if it is not None:
            a += f" T={it} n={ns}"
        lam = row.get("spsa_rec_penalty")
        if lam:
            cen = row.get("spsa_rec_center")
            a += f" λ={lam:g}" + (f" c={cen:g}" if cen is not None else "")
    eot = row.get("attack_eot_keys")
    if eot:
        a += f" EOT{eot}"
    init = row.get("rec_init")
    if init and init != "random":
        # non-default operating point (amortized init, round 5b/5c)
        a += (f" [{'enc' if init == 'encoder' else 'encjit'} "
              f"{row.get('rec_rr')}x{row.get('rec_iters')}]")
    return a


def whitebox_key(r):
    return ("wb", r.get("dataset"), r.get("model"), r.get("attack"),
            r.get("attack_grad"), r.get("fgsm_eps"),
            r.get("pgd_rec_penalty"), r.get("pgd_rec_center"),
            r.get("pgd_iters"), r.get("pgd_eps_iter"), r.get("pgd_z0"),
            r.get("cw_max_iterations"), r.get("cw_binary_search_steps"),
            r.get("spsa_iters"), r.get("spsa_samples"),
            r.get("spsa_delta"), r.get("spsa_lr"),
            r.get("spsa_rec_penalty"), r.get("spsa_rec_center"),
            r.get("spsa_objective"), r.get("spsa_margin_kappa"),
            r.get("load_adv"), r.get("detect_passes"),
            r.get("attack_rec_iters"), r.get("eval_z0"),
            r.get("attack_eot_keys"),
            r.get("num_tests"), r.get("rec_rr"), r.get("rec_iters"),
            r.get("rec_init"))


def blackbox_key(r):
    return ("bb", r.get("dataset"), r.get("bb_model"), r.get("sub_model"),
            r.get("fgsm_eps"), r.get("data_aug"), r.get("lmbda"),
            r.get("num_tests"))


def pipeline_key(r):
    return ("pl", r.get("dataset"), r.get("model"), r.get("set"),
            r.get("detector"), r.get("fpr"), r.get("calib_n"),
            r.get("calib_source"), r.get("rec_rr"), r.get("rec_iters"),
            r.get("rec_init"), r.get("n"))


def _dedup(rows, keyfn):
    out = {}
    for r in rows:  # file order == chronological; last wins
        out[keyfn(r)] = r
    return list(out.values())


def render(results_dir, datasets=()):
    wb = [r for r in _load(os.path.join(results_dir, "whitebox.jsonl"))
          if r.get("detection_auc") is not None]
    bb = [r for r in _load(os.path.join(results_dir, "blackbox.jsonl"))
          if r.get("detection_auc") is not None]
    pl = _load(os.path.join(results_dir, "pipeline.jsonl"))
    if datasets:
        keep = set(datasets)
        wb = [r for r in wb if r.get("dataset") in keep]
        bb = [r for r in bb if r.get("dataset") in keep]
        pl = [r for r in pl if r.get("dataset") in keep]
    wb = _dedup(wb, whitebox_key)
    bb = _dedup(bb, blackbox_key)
    pl = _dedup(pl, pipeline_key)

    lines = []
    if wb:
        lines += [
            "## White-box attacks — detection + joint metric",
            "",
            "| target | attack | def. acc | AUC 1s | AUC 2s | AUC 2f | "
            "TPR@5% 2s | undet. succ 1s | undet. succ 2s | "
            "undet. succ 2f |",
            "|---|---|---|---|---|---|---|---|---|---|",
        ]
        wb.sort(key=lambda r: (str(r.get("dataset")), str(r.get("attack")),
                               r.get("pgd_rec_penalty") or 0.0,
                               r.get("pgd_rec_center") or 0.0))
        for r in wb:
            lines.append(
                f"| {r.get('dataset')} | {_lam(r)} | "
                f"{_fmt(r.get('defended_acc'))} | "
                f"{_fmt(r.get('detection_auc'))} | "
                f"{_fmt(r.get('detection_auc_two_sided'))} | "
                f"{_fmt(r.get('detection_auc_combined'))} | "
                f"{_fmt(r.get('detection_tpr_at_fpr05_two_sided'))} | "
                f"{_fmt(r.get('undetected_success_rate'))} | "
                f"{_fmt(r.get('undetected_success_rate_two_sided'))} | "
                f"{_fmt(r.get('undetected_success_rate_combined'))} |")
        lines.append("")
    if bb:
        lines += [
            "## Black-box FGSM transfer — detection + joint metric",
            "",
            "| target | bb/sub | def. acc | AUC 1s | AUC 2s | "
            "TPR@5% 2s | undet. succ 1s | undet. succ 2s |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in sorted(bb, key=lambda r: str(r.get("dataset"))):
            lines.append(
                f"| {r.get('dataset')} | {r.get('bb_model')}/"
                f"{r.get('sub_model')} | {_fmt(r.get('defended_acc'))} | "
                f"{_fmt(r.get('detection_auc'))} | "
                f"{_fmt(r.get('detection_auc_two_sided'))} | "
                f"{_fmt(r.get('detection_tpr_at_fpr05_two_sided'))} | "
                f"{_fmt(r.get('undetected_success_rate'))} | "
                f"{_fmt(r.get('undetected_success_rate_two_sided'))} |")
        lines.append("")
    if pl:
        lines += [
            "## Serving pipeline (calibrated DefendedPipeline)",
            "",
            "| target | set | detector | calib | K/vote | flag rate | "
            "acc (all) | acc (unflagged) | undet. succ |",
            "|---|---|---|---|---|---|---|---|---|",
        ]
        for r in sorted(pl, key=lambda r: (str(r.get("dataset")),
                                           str(r.get("set")),
                                           str(r.get("detector")),
                                           str(r.get("calib_source")))):
            k = r.get("detect_passes", 1) or 1
            kv = f"{k}" + ("+vote" if r.get("vote") else "")
            calib = (f"{r.get('calib_source', 'train_tail')}"
                     f"({r.get('calib_n', '?')})")
            lines.append(
                f"| {r.get('dataset')} | {r.get('set')} | "
                f"{r.get('detector')} | {calib} | {kv} | "
                f"{_fmt(r.get('flag_rate'))} | {_fmt(r.get('acc_all'))} | "
                f"{_fmt(r.get('acc_unflagged'))} | "
                f"{_fmt(r.get('undetected_success_rate'))} |")
        lines.append("")
    if not lines:
        lines = ["(no detection rows found)", ""]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dir", default="output/results")
    ap.add_argument("--dataset", action="append", default=[],
                    help="restrict to these datasets (repeatable)")
    ap.add_argument("--out", default=None,
                    help="write markdown here instead of stdout")
    args = ap.parse_args(argv)
    md = render(args.results_dir, args.dataset)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}")
    else:
        sys.stdout.write(md)


if __name__ == "__main__":
    main()
