"""Regression tests for the round-4 driver/advisor fixes:

- dryrun_multichip must force the host platform BEFORE its first backend
  touch (round 3's MULTICHIP artifact died for 25 min claiming the TPU
  it never needs, during a service outage — VERDICT round-3 item 1a);
- bench.py's supervisor (round-5 redesign) relays incremental worker
  records, kills a hung worker at the deadline, and on total failure
  still emits a parseable diagnostic JSON line;
- bench.py's auto int8 promotion is gated on a per-checkpoint stamp
  (int8_gate_stamp — VERDICT round-3 item 4);
- the deep bench leg degrades an explicitly requested unrunnable kernel
  to the auto resolution instead of discarding the record (advisor);
- vs_baseline is recomputable exactly from the emitted rounded value
  (advisor: it used to be rounded from the unrounded throughput);
- pgd/make_chunked_pgd raise a clear ValueError when loss_fn is passed
  without keyed_logits (advisor).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


# --------------------------------------------- dryrun backend discipline
def test_dryrun_forces_cpu_before_any_backend_touch(monkeypatch,
                                                    eight_devices):
    """Every jax.devices() call inside the dryrun must happen with the
    platform already forced to cpu — the exact init-order property whose
    violation produced MULTICHIP_r03.json rc=124."""
    import __graft_entry__ as ge

    real_devices = jax.devices
    platforms_at_call = []

    def spy(*a, **kw):
        platforms_at_call.append(jax.config.jax_platforms)
        return real_devices(*a, **kw)

    monkeypatch.setattr(jax, "devices", spy)
    ge.dryrun_multichip(2)
    assert platforms_at_call, "dryrun never queried devices?"
    assert all(p == "cpu" for p in platforms_at_call), platforms_at_call


# --------------------------------------------- bench supervisor/deadline
# The round-5 redesign (VERDICT round-4 item 1: BENCH_r03 rc=1 +
# BENCH_r04 rc=124 — two rounds with no driver-captured perf number):
# a jax-free SUPERVISOR spawns the measurement worker, relays every
# record line it prints, and SIGKILLs it at --deadline. These tests run
# the real supervisor against fake workers via --_test_worker_cmd-style
# monkeypatching of the spawned command.


def _run_supervisor(monkeypatch, capsys, worker_py, deadline=5.0):
    import bench

    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        return real_popen([sys.executable, "-c", worker_py], **kw)

    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    args = type("A", (), {"deadline": deadline})()
    rc = bench.supervise(args, [])
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return rc, [json.loads(ln) for ln in out]


def test_supervisor_relays_incremental_records(monkeypatch, capsys):
    worker = ("import json\n"
              "print(json.dumps({'metric': 'm', 'value': 1.0,"
              " 'partial': True}), flush=True)\n"
              "print(json.dumps({'metric': 'm', 'value': 2.0}),"
              " flush=True)\n")
    rc, recs = _run_supervisor(monkeypatch, capsys, worker)
    assert rc == 0
    assert [r["value"] for r in recs] == [1.0, 2.0]
    assert "partial" not in recs[-1]  # the driver's line is the final one


def test_supervisor_kills_hung_worker_keeps_last_record(monkeypatch,
                                                        capsys):
    # worker prints one record then hangs forever (the wedged-PJRT case);
    # the supervisor must kill it at the deadline and the record stands
    # deadline must cover interpreter startup on a LOADED machine (a
    # 3 s budget flaked when the suite ran beside a chip queue: the
    # worker never printed before the kill, so the supervisor emitted
    # the diagnostic record instead of keeping the relayed one)
    worker = ("import json, time\n"
              "print(json.dumps({'metric': 'm', 'value': 3.0,"
              " 'partial': True}), flush=True)\n"
              "time.sleep(3600)\n")
    rc, recs = _run_supervisor(monkeypatch, capsys, worker, deadline=12.0)
    assert rc == 0
    assert recs[-1]["value"] == 3.0


def test_supervisor_diagnostic_when_worker_never_reports(monkeypatch,
                                                         capsys):
    # worker dies instantly with no record -> supervisor retries within
    # the deadline, then emits a parseable diagnostic record, rc 0
    worker = "import sys; sys.exit(3)\n"
    rc, recs = _run_supervisor(monkeypatch, capsys, worker, deadline=3.0)
    assert rc == 0
    rec = recs[-1]
    assert rec["metric"] == "mnist_reconstructions_per_sec_per_chip"
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "deadline" in rec["error"]


# ------------------------------------------------- int8 gate stamp
def _write_stamp(tmp_path, **kw):
    path = tmp_path / "checkpoints" / "int8_gate.json"
    path.write_text(json.dumps(kw))


def test_int8_gate_stamp(tmp_path):
    import bench

    out = str(tmp_path)
    # no checkpoints at all -> None
    assert bench.int8_gate_stamp(out) is None
    (tmp_path / "checkpoints" / "100").mkdir(parents=True)
    # checkpoint but no stamp -> None
    assert bench.int8_gate_stamp(out) is None
    # failing stamp -> None
    _write_stamp(tmp_path, step=100, **{"pass": False})
    assert bench.int8_gate_stamp(out) is None
    # stamp measured on an OLDER checkpoint than the one on disk -> None
    _write_stamp(tmp_path, step=50, **{"pass": True})
    assert bench.int8_gate_stamp(out) is None
    # passing stamp on the current step -> the stamp
    _write_stamp(tmp_path, step=100, **{"pass": True},
                 material_disagreement_int8=0.016)
    stamp = bench.int8_gate_stamp(out)
    assert stamp and stamp["material_disagreement_int8"] == 0.016
    # a retrain advancing the step re-voids the stamp
    (tmp_path / "checkpoints" / "200").mkdir()
    assert bench.int8_gate_stamp(out) is None
    # corrupt stamp file -> None, not a crash
    (tmp_path / "checkpoints" / "int8_gate.json").write_text("{nope")
    assert bench.int8_gate_stamp(out) is None


# --------------------------------------- deep-leg explicit-kernel fallback
def test_measure_deep_fallback_to_auto(tmp_path, monkeypatch, capsys):
    """--kernel pallas_int8 is valid for the wide headline but unrunnable
    on the deep topology; with fallback_to_auto the deep leg measures the
    auto resolution instead of sys.exiting after the headline was already
    measured (round-3 advisor)."""
    monkeypatch.chdir(tmp_path)  # no trained ckpts
    import bench

    deep_cfg = os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                            "mnist.yml")
    v, k, cfg = bench.measure(deep_cfg, batch=8, rec_rr=2, rec_iters=2,
                              repeats=1, kernel="pallas_int8",
                              fallback_to_auto=True)
    assert v > 0
    assert k == "xla"  # deep off-TPU auto resolution
    assert "measuring auto resolution" in capsys.readouterr().err
    # without the flag the same request still refuses (the leg fails and
    # the worker moves on without voiding earlier legs)
    with pytest.raises(RuntimeError, match="not runnable"):
        bench.measure(deep_cfg, batch=8, rec_rr=2, rec_iters=2,
                      repeats=1, kernel="pallas_int8")


# --------------------------------------------- pgd loss_fn key contract
def test_pgd_loss_fn_requires_keyed_logits():
    from defensegan_tpu.attacks import make_chunked_pgd, pgd

    def loss(x_adv, labels, key):  # pragma: no cover - never reached
        return jnp.zeros(x_adv.shape[0])

    x = jnp.zeros((2, 4, 4, 1))
    y = jnp.zeros((2,), jnp.int32)
    with pytest.raises(ValueError, match="keyed_logits"):
        pgd(lambda xb: jnp.zeros((xb.shape[0], 2)), x, y, eps=0.1,
            eps_iter=0.05, nb_iter=2, key=jax.random.key(0), loss_fn=loss)
    with pytest.raises(ValueError, match="keyed_logits"):
        make_chunked_pgd(lambda xb: jnp.zeros((xb.shape[0], 2)), eps=0.1,
                         eps_iter=0.05, nb_iter=2, loss_fn=loss)


# ------------------------------------------------- int8 gate criterion
def test_int8_gate_criterion_control_relative():
    """gate_ok (scripts/int8_validate.py) must judge BOTH axes against
    the bf16 control: round 4 measured a retrained checkpoint whose int8
    loss p95 (1.58e-3) tripped the old absolute 1e-3 bar while every
    material metric matched the bf16 control exactly."""
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from int8_validate import gate_ok

    # the round-4 measured case: material metrics identical, int8 loss
    # p95 within 2x the control's own noise -> pass
    assert gate_ok(0.0039, 0.0039, 1.58e-3, 1.4e-3)
    # int8 loss error far beyond the control's noise -> fail
    assert not gate_ok(0.0039, 0.0039, 5e-3, 1e-4)
    # near-exact control keeps the absolute floor usable
    assert gate_ok(0.0, 0.0, 9e-4, 0.0)
    assert not gate_ok(0.0, 0.0, 1.1e-3, 0.0)
    # material-disagreement leg unchanged: control-relative with slack
    assert gate_ok(0.034, 0.030, 0.0, 0.0)
    assert not gate_ok(0.05, 0.01, 0.0, 0.0)
