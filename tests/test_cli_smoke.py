"""End-to-end CLI smoke (tiny settings): train -> test-mode -> whitebox.
Mirrors the reference's own validation style (experiment reproduction,
SURVEY.md section 4) at minuscule scale."""

import json
import os

import pytest


@pytest.mark.slow
def test_train_testmode_whitebox_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from defensegan_tpu.cli import train, whitebox

    cfg_yml = os.path.join(os.path.dirname(__file__), "..",
                           "defensegan_tpu", "configs", "gans", "mnist.yml")
    out = str(tmp_path / "run")
    common = ["--cfg", cfg_yml, "--output_dir", out,
              "--override", "GEN_DIM=8", "--override", "DISC_DIM=8",
              "--override", "LATENT_DIM=16", "--override", "DISC_ITERS=1",
              "--override", "COMPUTE_DTYPE=float32",
              "--override", "SAMPLE_EVERY=10", "--override", "SAVE_EVERY=10",
              "--rec_rr", "2", "--rec_iters", "5", "--batch_size", "8"]

    train.main([*common, "--is_train", "--train_iters", "10"])
    assert os.path.exists(os.path.join(out, "cfg.yml"))
    assert os.path.isdir(os.path.join(out, "checkpoints", "10"))

    train.main(["--cfg", out, "--num_recs", "4",
                "--rec_rr", "2", "--rec_iters", "5"])
    assert os.path.exists(os.path.join(out, "test_samples.png"))
    assert os.path.exists(os.path.join(out, "test_reconstructions.png"))

    rec = whitebox.main([
        "--cfg", out, "--attack_type", "fgsm", "--defense_type",
        "defense_gan", "--model", "E", "--num_tests", "16",
        "--classifier_epochs", "1", "--attack_rec_iters", "2",
        "--attack_batch", "16", "--rec_rr", "2", "--rec_iters", "5",
        "--results_dir", str(tmp_path / "results")])
    assert 0.0 <= rec["defended_acc"] <= 1.0
    lines = open(tmp_path / "results" / "whitebox.jsonl").read().splitlines()
    assert json.loads(lines[-1])["attack"] == "fgsm"

    # defense-unaware attacker path (attack crafted on the bare classifier)
    rec2 = whitebox.main([
        "--cfg", out, "--attack_type", "fgsm", "--defense_type",
        "defense_gan", "--model", "E", "--num_tests", "16",
        "--classifier_epochs", "1", "--attack_through_defense", "no",
        "--attack_batch", "16", "--rec_rr", "2", "--rec_iters", "5",
        "--results_dir", str(tmp_path / "results")])
    assert rec2["attack_through_defense"] == "no"
    assert 0.0 <= rec2["defended_acc"] <= 1.0
