"""Reference CLI flag-surface parity (SURVEY.md sections 1-2): every flag
the reference's train.py / whitebox.py / blackbox.py document must parse
here under the same name — users switching from kabkabm/defensegan keep
their command lines. Parse-only (no execution)."""

import pytest


def _parser(module):
    """Grab the CLI's ArgumentParser without executing main()."""
    import argparse
    captured = {}
    real_parse = argparse.ArgumentParser.parse_args

    def fake_parse(self, args=None, namespace=None):
        captured["parser"] = self
        raise SystemExit(0)  # stop main() right after parsing setup

    argparse.ArgumentParser.parse_args = fake_parse
    try:
        with pytest.raises(SystemExit):
            module.main([])
    finally:
        argparse.ArgumentParser.parse_args = real_parse
    return captured["parser"]


def _flags(parser):
    out = set()
    for a in parser._actions:
        out.update(o for o in a.option_strings if o.startswith("--"))
    return out


def test_whitebox_reference_flags():
    from defensegan_tpu.cli import whitebox
    flags = _flags(_parser(whitebox))
    # reference: whitebox.py of kabkabm/defensegan (~L60-350)
    for f in ("--cfg", "--attack_type", "--defense_type", "--model",
              "--num_tests", "--fgsm_eps", "--rec_iters", "--rec_rr",
              "--rec_lr", "--train_on_recs", "--online_training",
              "--results_dir"):
        assert f in flags, f


def test_blackbox_reference_flags():
    from defensegan_tpu.cli import blackbox
    flags = _flags(_parser(blackbox))
    # reference: blackbox.py (cleverhans mnist_blackbox recipe flags)
    for f in ("--cfg", "--bb_model", "--sub_model", "--fgsm_eps",
              "--data_aug", "--lmbda", "--num_tests", "--defense_type",
              "--rec_iters", "--rec_rr", "--rec_lr", "--train_on_recs"):
        assert f in flags, f


def test_train_reference_flags():
    from defensegan_tpu.cli import train
    flags = _flags(_parser(train))
    for f in ("--cfg", "--is_train", "--rec_iters", "--rec_rr",
              "--rec_lr", "--batch_size", "--train_iters"):
        assert f in flags, f


def test_whitebox_attack_eot_keys_validation():
    """--attack_eot_keys (the vote-aware EOT counter-attack) is rejected at
    PARSE time for combos whose semantics are undefined: spsa (already
    key-averaged per iteration), the pgd_rec_penalty loss path, and
    --eval_z0 both (no single z0 to replay). Parse-time because a bad
    combo must not burn a full craft+eval pipeline first."""
    from defensegan_tpu.cli import whitebox

    bad = (
        ["--cfg", "x.yml", "--attack_type", "spsa",
         "--attack_eot_keys", "2"],
        ["--cfg", "x.yml", "--attack_type", "pgd",
         "--attack_eot_keys", "2", "--pgd_rec_penalty", "30"],
        ["--cfg", "x.yml", "--attack_type", "cw",
         "--attack_eot_keys", "2", "--eval_z0", "both"],
        ["--cfg", "x.yml", "--attack_type", "cw",
         "--attack_eot_keys", "2", "--attack_through_defense", "no"],
    )
    for argv in bad:
        with pytest.raises(SystemExit) as e:
            whitebox.main(argv)
        assert e.value.code == 2, argv


def test_whitebox_spsa_center_quantiles_validation():
    """--spsa_center_quantiles (the dispersed-center counter to
    concentration-aware combiners) is rejected at PARSE time without a
    rec penalty, combined with the fixed --spsa_rec_center, or with an
    out-of-order/out-of-range quantile pair."""
    from defensegan_tpu.cli import whitebox

    bad = (
        # no penalty to shape
        ["--cfg", "x.yml", "--attack_type", "spsa",
         "--spsa_center_quantiles", "0.05", "0.95"],
        # mutually exclusive with the fixed center
        ["--cfg", "x.yml", "--attack_type", "spsa",
         "--spsa_rec_penalty", "300", "--spsa_rec_center", "0.033",
         "--spsa_center_quantiles", "0.05", "0.95"],
        # LO >= HI
        ["--cfg", "x.yml", "--attack_type", "spsa",
         "--spsa_rec_penalty", "300",
         "--spsa_center_quantiles", "0.9", "0.1"],
        # out of [0, 1]
        ["--cfg", "x.yml", "--attack_type", "spsa",
         "--spsa_rec_penalty", "300",
         "--spsa_center_quantiles", "0.05", "1.5"],
    )
    for argv in bad:
        with pytest.raises(SystemExit) as e:
            whitebox.main(argv)
        assert e.value.code == 2, argv
