"""Driver-contract smoke: the two entry points the round driver invokes
must keep working — bench.py (one JSON line, honest kernel labeling) and
__graft_entry__.entry() (jittable forward step). dryrun_multichip is
covered by tests/test_parallel.py + the driver's own run; here we pin the
single-chip pieces at tiny CPU scale."""

import io
import json
import os
import sys
from contextlib import redirect_stdout

import jax
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def test_bench_main_emits_parseable_records(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no trained ckpts -> random init
    import bench

    buf = io.StringIO()
    # --deadline 0 = run the worker in-process (no subprocess/backend kill
    # machinery, which the supervisor tests cover)
    argv = ["bench.py", "--batch", "32", "--rec_rr", "2", "--rec_iters",
            "3", "--repeats", "1", "--deep_cfg", "", "--deadline", "0"]
    monkeypatch.setattr(sys, "argv", argv)
    with redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            bench.main()
        assert e.value.code in (0, None)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert lines, "worker printed no record"
    # EVERY line is a parseable record (the driver may catch any of them),
    # and the LAST one is the final, non-partial record
    recs = [json.loads(ln) for ln in lines]
    for rec in recs:
        assert rec["metric"] == "mnist_reconstructions_per_sec_per_chip"
        assert rec["value"] > 0
        assert rec["vs_baseline"] == round(rec["value"] / 1000.0, 4)
    rec = recs[-1]
    assert "partial" not in rec
    # off-TPU the wide flagship must be labeled with what actually runs
    # (the packed XLA path), never a pallas name
    assert rec["kernel"] == "packed"
    assert rec["gen_arch"] == "wide"
    assert "deep_value" not in rec  # --deep_cfg '' skips the deep leg


def test_bench_deep_fields(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import bench

    buf = io.StringIO()
    deep_cfg = os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                            "mnist.yml")
    argv = ["bench.py", "--batch", "16", "--deep_batch", "16", "--rec_rr",
            "2", "--rec_iters", "2", "--repeats", "1",
            "--deep_cfg", deep_cfg, "--deadline", "0"]
    monkeypatch.setattr(sys, "argv", argv)
    with redirect_stdout(buf):
        with pytest.raises(SystemExit) as e:
            bench.main()
        assert e.value.code in (0, None)
    rec = json.loads([ln for ln in buf.getvalue().splitlines()
                      if ln.strip()][-1])
    assert rec["deep_kernel"] == "xla"  # deep off-TPU best path
    assert rec["deep_value"] > 0
    assert rec["deep_vs_baseline"] == round(rec["deep_value"] / 1000.0, 4)


def test_graft_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 28, 28, 1)
    assert bool(jax.numpy.isfinite(out).all())
