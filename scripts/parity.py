#!/usr/bin/env python
"""Turnkey paper-parity harness (VERDICT round-1 item 3).

One command reproduces the Defense-GAN paper's robust-accuracy tables
(arXiv:1805.06605; targets mirrored in BASELINE.md) and diffs every cell
against the expected value with per-cell tolerances:

  python scripts/parity.py                      # full table, MNIST+F-MNIST
  python scripts/parity.py --quick              # model A, small test set
  python scripts/parity.py --datasets mnist --models A B

Pipeline per dataset: maybe_download() -> (train or reuse) WGAN ->
white-box {fgsm, rand_fgsm, cw} x models x {none, defense_gan, adv_tr} ->
black-box substitutes {B, E} x {none, defense_gan, adv_tr}. Results land in
output/results/parity.md (+ .json), including a paper-layout rendering so
the diff against the published tables is cell-for-cell. Exit code: 0 = all
checked cells pass (or data is synthetic — then the report is explicitly
labeled QUALITATIVE and no parity claim is made), 1 = a parity cell failed
on real data.

Kernel note: cells run the library default projection path (auto = bf16
Pallas v2/v3 on TPU — int8 is opt-in and never used here, so no
quantization re-gate is needed when real data lands; round-2 advisor).

Resume keys include the attack-strength settings (num_tests, CW
iterations/binary-search steps, attack_rec_iters): a resumed run with
different strength flags re-runs the affected cells instead of silently
reusing results measured under the old settings (round-2 advisor).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

CFG_DIR = os.path.join("defensegan_tpu", "configs", "gans")
CFGS = {"mnist": "mnist_fast.yml", "f-mnist": "fmnist.yml"}

# Expected cells: (dataset, model, attack, defense) -> (lo, hi) acceptance
# band. Bands for model A come from the paper's tables +-1-2% [P, approx —
# SURVEY.md section 6 provenance]; other models' bands are the paper's
# qualitative pattern (defense restores accuracy, no-defense collapses)
# widened for cross-model variation. None = record only, no check.
PARITY = {
    ("mnist", "A", "none", "none"): (0.985, 1.0),       # clean ~0.997
    ("mnist", "A", "fgsm", "none"): (0.0, 0.35),        # ~0.22
    ("mnist", "A", "fgsm", "defense_gan"): (0.975, 1.0),   # ~0.988
    ("mnist", "A", "fgsm", "adv_tr"): (0.50, 0.80),     # ~0.65
    ("mnist", "A", "rand_fgsm", "none"): (0.0, 0.40),
    ("mnist", "A", "rand_fgsm", "defense_gan"): (0.965, 1.0),  # ~0.98
    ("mnist", "A", "cw", "none"): (0.0, 0.15),          # CW ~always succeeds
    ("mnist", "A", "cw", "defense_gan"): (0.965, 1.0),  # ~0.98-0.99
    ("f-mnist", "A", "none", "none"): (0.88, 1.0),
    ("f-mnist", "A", "fgsm", "none"): (0.0, 0.30),      # ~0.1
    ("f-mnist", "A", "fgsm", "defense_gan"): (0.85, 1.0),  # ~0.88-0.90
    ("f-mnist", "A", "fgsm", "adv_tr"): (0.30, 0.90),
    ("f-mnist", "A", "rand_fgsm", "none"): (0.0, 0.40),
    ("f-mnist", "A", "rand_fgsm", "defense_gan"): (0.75, 1.0),
    ("f-mnist", "A", "cw", "none"): (0.0, 0.20),
    ("f-mnist", "A", "cw", "defense_gan"): (0.75, 1.0),
    # black-box rows: key = (dataset, sub_model, "blackbox", defense)
    ("mnist", "B", "blackbox", "none"): (0.0, 0.6),     # ~0.2-0.5
    ("mnist", "B", "blackbox", "defense_gan"): (0.90, 1.0),  # ~0.92-0.96
    ("mnist", "B", "blackbox", "adv_tr"): (0.30, 0.95),
    ("mnist", "E", "blackbox", "none"): (0.0, 0.6),
    ("mnist", "E", "blackbox", "defense_gan"): (0.90, 1.0),
    ("mnist", "E", "blackbox", "adv_tr"): (0.30, 0.95),
    ("f-mnist", "B", "blackbox", "none"): (0.0, 0.6),
    ("f-mnist", "B", "blackbox", "defense_gan"): (0.55, 1.0),
    ("f-mnist", "B", "blackbox", "adv_tr"): (0.20, 0.95),
    ("f-mnist", "E", "blackbox", "none"): (0.0, 0.6),
    ("f-mnist", "E", "blackbox", "defense_gan"): (0.55, 1.0),
    ("f-mnist", "E", "blackbox", "adv_tr"): (0.20, 0.95),
}
# generic pattern bands for non-A models (every (attack, defense) combo the
# harness produces has a band — VERDICT round-2 missing item 6)
GENERIC = {
    "mnist": {
        ("none", "none"): (0.90, 1.0),
        ("fgsm", "none"): (0.0, 0.45),
        ("fgsm", "defense_gan"): (0.85, 1.0),
        ("fgsm", "adv_tr"): (0.40, 0.95),
        ("rand_fgsm", "none"): (0.0, 0.45),
        ("rand_fgsm", "defense_gan"): (0.85, 1.0),
        ("cw", "none"): (0.0, 0.20),
        ("cw", "defense_gan"): (0.85, 1.0),
    },
    "f-mnist": {
        ("none", "none"): (0.80, 1.0),
        ("fgsm", "none"): (0.0, 0.45),
        ("fgsm", "defense_gan"): (0.70, 1.0),
        ("fgsm", "adv_tr"): (0.25, 0.95),
        ("rand_fgsm", "none"): (0.0, 0.45),
        ("rand_fgsm", "defense_gan"): (0.70, 1.0),
        ("cw", "none"): (0.0, 0.25),
        ("cw", "defense_gan"): (0.70, 1.0),
    },
}


def band_for(dataset, model, attack, defense):
    key = (dataset, model, attack, defense)
    if key in PARITY:
        return PARITY[key]
    return GENERIC.get(dataset, {}).get((attack, defense))


def cell_value(record, attack, defense):
    if attack == "none":
        return record["clean_acc"]
    if defense == "none":
        return record["adv_acc_no_defense"]
    return record["defended_acc"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets", nargs="+", default=["mnist", "f-mnist"],
                    choices=sorted(CFGS))
    ap.add_argument("--models", nargs="+",
                    default=["A", "B", "C", "D", "E", "F"])
    ap.add_argument("--attacks", nargs="+",
                    default=["fgsm", "rand_fgsm", "cw"])
    ap.add_argument("--num_tests", type=int, default=512)
    ap.add_argument("--train_iters", type=int, default=20000,
                    help="GAN training steps when no checkpoint exists")
    ap.add_argument("--classifier_epochs", type=int, default=10)
    ap.add_argument("--cw_max_iterations", type=int, default=1000)
    ap.add_argument("--cw_binary_search_steps", type=int, default=5)
    ap.add_argument("--cw_full_models", nargs="+", default=["A"],
                    help="models attacked with full-strength CW "
                    "(cw_max_iterations x cw_binary_search_steps) through "
                    "the defense; the paper's headline CW rows are model A. "
                    "Other models use the light settings below — a "
                    "full-strength through-defense CW cell costs ~25 min of "
                    "chip time, so sweeping all 6 models x 2 datasets at "
                    "1000x5 would take ~6 h.")
    ap.add_argument("--cw_light_iterations", type=int, default=200)
    ap.add_argument("--cw_light_bs_steps", type=int, default=4)
    ap.add_argument("--cw_chunk_iters", type=int, default=25,
                    help="CW device-call chunk size. 25 keeps one chunk "
                    "under ~30 s of device time even for the deep dim-64 "
                    "generator (grad-through-L=200 at batch 256 runs ~1 "
                    "s/iteration there; ~100 s chunks crashed the TPU "
                    "worker watchdog)")
    ap.add_argument("--attack_rec_iters", type=int, default=200)
    ap.add_argument("--sub_models", nargs="+", default=["B", "E"])
    ap.add_argument("--blackbox_datasets", nargs="+",
                    default=["mnist", "f-mnist"],
                    help="datasets to run the black-box table on (the "
                    "paper publishes black-box rows for both MNIST and "
                    "F-MNIST)")
    ap.add_argument("--eval_z0", default="fresh", choices=["fresh", "both"],
                    help="passed to whitebox: 'both' also records the "
                    "attack-z0-reuse defended accuracy per cell")
    ap.add_argument("--quick", action="store_true",
                    help="model A only, 128 tests, CW 100 iters")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore previously-completed cells (default: "
                    "resume — cells already in parity_rows.jsonl with "
                    "MATCHING strength settings are skipped, so a crashed "
                    "multi-hour run restarts where it left off)")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args()
    if args.quick:
        args.models = ["A"]
        args.num_tests = 128
        args.cw_max_iterations = 100
        args.cw_binary_search_steps = 3
        args.attack_rec_iters = 50
        args.sub_models = ["B"]
        args.blackbox_datasets = ["mnist"]

    from defensegan_tpu.cli import blackbox, train, whitebox
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.data import get_dataset
    from defensegan_tpu.data.fetch import maybe_download

    def strength_of(attack, model):
        """The attack-strength settings a cell's result depends on — part
        of the resume key (round-2 advisor: changed flags must invalidate
        stale cells)."""
        s = {"num_tests": args.num_tests,
             "classifier_epochs": args.classifier_epochs}
        if attack in ("fgsm", "rand_fgsm", "cw"):
            s["attack_rec_iters"] = args.attack_rec_iters
        if attack == "cw":
            full = model in args.cw_full_models
            s["cw_max_iterations"] = (args.cw_max_iterations if full
                                      else args.cw_light_iterations)
            s["cw_binary_search_steps"] = (args.cw_binary_search_steps
                                           if full else args.cw_light_bs_steps)
            s["num_tests"] = min(args.num_tests, 256)
        return s

    # Crash-resilient cell accounting: every completed cell is appended to
    # parity_rows.jsonl immediately, and (unless --fresh) cells recorded
    # there under the SAME strength settings are skipped on restart — a
    # failed cell costs one cell, not the whole multi-hour table.
    os.makedirs(args.results_dir, exist_ok=True)
    rows_path = os.path.join(args.results_dir, "parity_rows.jsonl")
    done = {}
    if not args.fresh and os.path.exists(rows_path):
        with open(rows_path) as f:
            for line in f:
                r = json.loads(line)
                done[(r["dataset"], r["model"], r["attack"],
                      r["defense"])] = r
        if done:
            print(f"resuming: {len(done)} cells already in {rows_path} "
                  "(--fresh to redo; strength-mismatched cells re-run)")

    # all_rows: everything known — previously-persisted cells PLUS this
    # run's. The report covers the union, so narrowing --datasets/--models
    # on a resume run never drops earlier cells from the table.
    all_rows = {k: (r["accuracy"], r["real_data"]) for k, r in done.items()}
    errors = []

    def run_cell(dataset, model, attack, defense, real, fn):
        key = (dataset, model, attack, defense)
        prev = done.get(key)
        strength = strength_of(attack, model)
        if (prev is not None and prev.get("strength") == strength
                and bool(prev.get("real_data")) == bool(real)):
            return
        if prev is not None:
            if bool(prev.get("real_data")) != bool(real):
                # the real-data runbook (README): when IDX files land,
                # synthetic-fallback cells re-run on real data instead of
                # being silently skipped by the resume
                print(f"data changed for {key} (real_data "
                      f"{prev.get('real_data')} -> {real}); re-running")
            else:
                print(f"strength changed for {key} "
                      f"({prev.get('strength')} -> {strength}); re-running")
        try:
            val = fn()
        except KeyboardInterrupt:
            raise
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"CELL FAILED {key} — continuing", flush=True)
            errors.append(key)
            all_rows[key] = (None, real)
            return
        all_rows[key] = (val, real)
        with open(rows_path, "a") as f:
            f.write(json.dumps({
                "dataset": dataset, "model": model, "attack": attack,
                "defense": defense, "accuracy": val, "real_data": real,
                "strength": strength,
            }) + "\n")

    any_fail = False
    all_real = True
    t_start = time.time()
    for dataset in args.datasets:
        print("=" * 72, f"\n[{dataset}] data", "\n" + "=" * 72)
        maybe_download(dataset)
        ds = get_dataset(dataset)
        real = ds._load_real("test") is not None
        all_real &= real
        print(f"[{dataset}] real data: {real}"
              + ("" if real else "  (synthetic fallback -> QUALITATIVE run)"))

        cfg_path = os.path.join(CFG_DIR, CFGS[dataset])
        cfg = load_config(cfg_path)
        gan_dir = cfg.output_dir
        from defensegan_tpu.ckpt import latest_step
        if latest_step(gan_dir) is None:
            print(f"[{dataset}] no GAN checkpoint -> training "
                  f"{args.train_iters} steps")
            train.main(["--cfg", cfg_path, "--is_train",
                        "--train_iters", str(args.train_iters),
                        "--override", "SAVE_EVERY=5000",
                        "--override", "SAMPLE_EVERY=5000"])
        else:
            print(f"[{dataset}] reusing GAN checkpoint in {gan_dir} "
                  f"(step {latest_step(gan_dir)})")

        # ---- white-box table
        for model in args.models:
            # clean row (attack none, defense none)
            run_cell(dataset, model, "none", "none", real,
                     lambda: cell_value(whitebox.main(
                         ["--cfg", gan_dir, "--attack_type", "none",
                          "--defense_type", "none", "--model", model,
                          "--num_tests", str(args.num_tests),
                          "--classifier_epochs",
                          str(args.classifier_epochs)]), "none", "none"))
            for attack in args.attacks:
                for defense in ("none", "defense_gan", "adv_tr"):
                    if attack != "fgsm" and defense == "adv_tr":
                        continue  # paper reports adv_tr under FGSM only
                    # CW cells cap num_tests at 256 (through-defense CW is
                    # ~minutes per image-batch); the cap goes into the ONE
                    # --num_tests entry rather than a second occurrence
                    # that only wins by argparse last-wins
                    n_tests = (min(args.num_tests, 256) if attack == "cw"
                               else args.num_tests)
                    argv = ["--cfg", gan_dir, "--attack_type", attack,
                            "--defense_type", defense, "--model", model,
                            "--num_tests", str(n_tests),
                            "--classifier_epochs",
                            str(args.classifier_epochs),
                            "--attack_rec_iters",
                            str(args.attack_rec_iters)]
                    if defense == "defense_gan":
                        # the replay leg only exists for defended cells
                        # (whitebox now rejects --eval_z0 both elsewhere)
                        argv += ["--eval_z0", args.eval_z0]
                    if attack == "cw":
                        full = model in args.cw_full_models
                        cw_iters = (args.cw_max_iterations if full
                                    else args.cw_light_iterations)
                        cw_bs = (args.cw_binary_search_steps if full
                                 else args.cw_light_bs_steps)
                        argv += ["--cw_max_iterations", str(cw_iters),
                                 "--cw_binary_search_steps", str(cw_bs),
                                 # cleverhans' own default; also saves chip
                                 # time on the no-progress low-c bs steps
                                 "--cw_abort_early",
                                 "--cw_chunk_iters",
                                 str(args.cw_chunk_iters),
                                 # one full-width batch: best MXU utilization
                                 # for the grad-through-reconstruction steps
                                 "--attack_batch", str(n_tests)]
                    run_cell(dataset, model, attack, defense, real,
                             lambda argv=argv, attack=attack,
                             defense=defense: cell_value(
                                 whitebox.main(argv), attack, defense))

        # ---- black-box substitutes (paper publishes MNIST and F-MNIST)
        if dataset in args.blackbox_datasets:
            for sub in args.sub_models:
                for defense in ("none", "defense_gan", "adv_tr"):
                    def bb_cell(sub=sub, defense=defense):
                        rec = blackbox.main(
                            ["--cfg", gan_dir, "--bb_model", "A",
                             "--sub_model", sub,
                             "--num_tests", str(args.num_tests),
                             "--classifier_epochs",
                             str(args.classifier_epochs),
                             "--defense_type", defense])
                        return (rec["defended_acc"] if defense != "none"
                                else rec["adv_acc_no_defense"])
                    run_cell(dataset, sub, "blackbox", defense, real,
                             bb_cell)

    # ---- report
    os.makedirs(args.results_dir, exist_ok=True)
    lines = ["# Parity report",
             f"generated by scripts/parity.py in {time.time()-t_start:.0f}s",
             ""]
    if not all_real:
        lines += ["**QUALITATIVE RUN — synthetic fallback data was used for "
                  "at least one dataset; cells are NOT parity evidence "
                  "(BASELINE.md caveat: paper numbers need the real IDX "
                  "files).**", ""]
    lines += ["| dataset | model | attack | defense | accuracy | expected "
              "| verdict |", "|---|---|---|---|---|---|---|"]
    checked = passed = 0
    verdicts = {}
    for (dataset, model, attack, defense), (val, real) in sorted(
            all_rows.items()):
        band = band_for(dataset, model, attack, defense)
        if band is None or val is None:
            verdict, exp = "—", "—"
        elif not real:
            verdict = "qualitative"
            exp = f"[{band[0]:.2f}, {band[1]:.2f}]"
        else:
            checked += 1
            ok = band[0] <= val <= band[1]
            passed += ok
            any_fail |= not ok
            verdict = "PASS" if ok else "**FAIL**"
            exp = f"[{band[0]:.2f}, {band[1]:.2f}]"
        verdicts[(dataset, model, attack, defense)] = verdict
        v = "—" if val is None else f"{val:.4f}"
        lines.append(f"| {dataset} | {model} | {attack} | {defense} "
                     f"| {v} | {exp} | {verdict} |")
    lines += ["", f"checked cells: {checked}, passed: {passed}" if all_real
              else "no parity cells checked (synthetic data)"]

    # ---- paper-layout rendering (cell-for-cell against the published
    # tables; VERDICT round-2 item 7). White-box: one row per classifier
    # model, columns grouped as the paper groups them; black-box: one row
    # per substitute.
    def fmt(dataset, model, attack, defense):
        val, _ = all_rows.get((dataset, model, attack, defense),
                              (None, None))
        if val is None:
            return "—"
        v = f"{val:.3f}"
        verdict = verdicts.get((dataset, model, attack, defense), "—")
        return f"**{v}**!" if verdict == "**FAIL**" else v

    for dataset in sorted({k[0] for k in all_rows}):
        wb_models = sorted({m for (d, m, a, _), _ in all_rows.items()
                            if d == dataset and a != "blackbox"})
        if wb_models:
            lines += ["", f"## {dataset} — white-box "
                      "(paper Tables 1/2/3 layout; '!' marks a FAIL)",
                      "",
                      "| model | clean | fgsm | fgsm+dg | fgsm+advtr "
                      "| rfgsm | rfgsm+dg | cw | cw+dg |",
                      "|---|---|---|---|---|---|---|---|---|"]
            for m in wb_models:
                cells = [fmt(dataset, m, "none", "none"),
                         fmt(dataset, m, "fgsm", "none"),
                         fmt(dataset, m, "fgsm", "defense_gan"),
                         fmt(dataset, m, "fgsm", "adv_tr"),
                         fmt(dataset, m, "rand_fgsm", "none"),
                         fmt(dataset, m, "rand_fgsm", "defense_gan"),
                         fmt(dataset, m, "cw", "none"),
                         fmt(dataset, m, "cw", "defense_gan")]
                lines.append(f"| {m} | " + " | ".join(cells) + " |")
        bb_models = sorted({m for (d, m, a, _), _ in all_rows.items()
                            if d == dataset and a == "blackbox"})
        if bb_models:
            lines += ["", f"## {dataset} — black-box (paper Table 4 layout)",
                      "",
                      "| substitute | no defense | defense-gan | adv_tr |",
                      "|---|---|---|---|"]
            for m in bb_models:
                cells = [fmt(dataset, m, "blackbox", "none"),
                         fmt(dataset, m, "blackbox", "defense_gan"),
                         fmt(dataset, m, "blackbox", "adv_tr")]
                lines.append(f"| {m} | " + " | ".join(cells) + " |")

    if errors:
        lines += ["", f"**{len(errors)} cell(s) ERRORED** (see log): "
                  + ", ".join("/".join(k) for k in errors)]
    report = "\n".join(lines)
    with open(os.path.join(args.results_dir, "parity.md"), "w") as f:
        f.write(report + "\n")
    with open(os.path.join(args.results_dir, "parity.json"), "w") as f:
        json.dump([{"dataset": d, "model": m, "attack": a, "defense": de,
                    "accuracy": v, "real_data": r}
                   for (d, m, a, de), (v, r) in sorted(all_rows.items())],
                  f, indent=1)
    print(report)
    print(f"\nwrote {args.results_dir}/parity.md")
    sys.exit(1 if ((all_real and any_fail) or errors) else 0)


if __name__ == "__main__":
    main()
