"""scripts/detect_matrix.py — the defense-in-depth table renderer."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import detect_matrix  # noqa: E402


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _wb_row(**kw):
    base = {"script": "whitebox", "dataset": "digits", "model": "A",
            "attack": "pgd", "attack_grad": "bpda", "fgsm_eps": 0.1,
            "pgd_rec_penalty": 30.0, "pgd_rec_center": None,
            "pgd_iters": 40, "cw_max_iterations": None, "eval_z0": "fresh",
            "num_tests": 256, "rec_rr": 10, "rec_iters": 200,
            "defended_acc": 0.5, "detection_auc": 0.9,
            "detection_auc_two_sided": 0.8,
            "detection_tpr_at_fpr05_two_sided": 0.7,
            "undetected_success_rate": 0.1,
            "undetected_success_rate_two_sided": 0.05}
    base.update(kw)
    return base


def test_render_dedups_last_wins_and_skips_nondetect(tmp_path):
    _write(tmp_path / "whitebox.jsonl", [
        _wb_row(defended_acc=0.1),          # superseded re-run of same cell
        _wb_row(defended_acc=0.42),          # last wins
        _wb_row(attack="fgsm", attack_grad=None, pgd_rec_penalty=None,
                defended_acc=0.6),
        {"script": "whitebox", "dataset": "digits", "attack": "cw",
         "defended_acc": 0.9, "detection_auc": None},  # no --detect: skip
    ])
    md = detect_matrix.render(str(tmp_path))
    # defended-acc cell carries the re-run (0.42), not the stale 0.1
    assert "λ=30 | 0.420 |" in md and "λ=30 | 0.100 |" not in md
    assert "pgd/bpda λ=30" in md
    assert "| digits | fgsm |" in md
    assert " cw " not in md


def test_render_blackbox_pipeline_and_dataset_filter(tmp_path):
    _write(tmp_path / "blackbox.jsonl", [
        {"script": "blackbox", "dataset": "digits", "bb_model": "A",
         "sub_model": "B", "fgsm_eps": 0.1, "num_tests": 256,
         "defended_acc": 0.88, "detection_auc": 1.0,
         "detection_auc_two_sided": 1.0,
         "detection_tpr_at_fpr05_two_sided": 1.0,
         "undetected_success_rate": 0.0,
         "undetected_success_rate_two_sided": 0.0}])
    _write(tmp_path / "pipeline.jsonl", [
        {"script": "pipeline_exp", "dataset": "digits", "model": "A",
         "set": "digits_fgsm", "detector": "two_sided", "fpr": 0.05,
         "n": 256, "flag_rate": 0.9, "acc_all": 0.8,
         "acc_unflagged": 0.95, "undetected_success_rate": 0.01},
        {"script": "pipeline_exp", "dataset": "mnist", "model": "A",
         "set": "other", "detector": "two_sided", "fpr": 0.05, "n": 256,
         "flag_rate": 0.5, "acc_all": 0.5, "acc_unflagged": 0.5,
         "undetected_success_rate": 0.5}])
    md = detect_matrix.render(str(tmp_path), datasets=["digits"])
    assert "| digits | A/B |" in md
    assert "| digits | digits_fgsm |" in md
    assert "mnist" not in md          # dataset filter applied
    assert "White-box" not in md      # no whitebox.jsonl → section omitted


def test_missing_files_render_placeholder(tmp_path):
    assert "no detection rows" in detect_matrix.render(str(tmp_path))
