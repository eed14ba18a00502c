"""Chip-queue runner (scripts/queue_lib.py): marker-based resume and
per-step crash isolation — the machinery every round3_queue*.py relies on
to survive TPU worker crashes without redoing hours of work."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import queue_lib  # noqa: E402


def _run(steps, only=(), label="t"):
    with pytest.raises(SystemExit) as e:
        queue_lib.run_steps(steps, only, label=label)
    return e.value.code


def test_markers_failures_and_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(queue_lib, "QDIR", str(tmp_path / "q"))
    calls = []

    def ok():
        calls.append("ok")

    def boom():
        calls.append("boom")
        raise RuntimeError("step exploded")

    # first run: ok succeeds (marker written), boom fails -> exit 1
    assert _run([("ok", ok), ("boom", boom)]) == 1
    assert os.path.exists(tmp_path / "q" / "ok.done")
    assert not os.path.exists(tmp_path / "q" / "boom.done")
    assert calls == ["ok", "boom"]

    # resume: ok is skipped via its marker, boom re-runs
    assert _run([("ok", ok), ("boom", boom)]) == 1
    assert calls == ["ok", "boom", "boom"]

    # explicit step selection ignores markers
    assert _run([("ok", ok), ("boom", boom)], only=["ok"]) == 0
    assert calls == ["ok", "boom", "boom", "ok"]


def test_keyboard_interrupt_propagates(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(queue_lib, "QDIR", str(tmp_path / "q"))

    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        queue_lib.run_steps([("x", interrupted)])


def test_run_spec_data_driven_legs(tmp_path, monkeypatch):
    """run_spec turns a LEGS table into steps (round-4 queue pattern):
    params pass to the named runner as kwargs, qdir overrides the marker
    dir, and late-bound closures must not alias the loop variable."""
    monkeypatch.chdir(tmp_path)
    # run_spec(qdir=...) assigns the module global; register the current
    # value with monkeypatch so it is restored after this test
    monkeypatch.setattr(queue_lib, "QDIR", queue_lib.QDIR)
    calls = []
    runners = {"rec": lambda **kw: calls.append(kw)}
    legs = [
        {"name": "a", "run": "rec", "x": 1},
        {"name": "b", "run": "rec", "x": 2, "y": "z"},
    ]
    with pytest.raises(SystemExit) as e:
        queue_lib.run_spec(legs, runners, qdir=str(tmp_path / "q4"))
    assert e.value.code == 0
    assert calls == [{"x": 1}, {"x": 2, "y": "z"}]
    assert os.path.exists(tmp_path / "q4" / "a.done")
    assert os.path.exists(tmp_path / "q4" / "b.done")
    # the legs list itself must be left un-mutated (it is a shared spec)
    assert legs[0] == {"name": "a", "run": "rec", "x": 1}


def test_round4_queue_spec_parses():
    """The round-4 LEGS table references runners that exist and scripts
    that are on disk (catch a typo'd path before chip time is spent)."""
    import importlib.util

    path = os.path.join(ROOT, "scripts", "round4_queue.py")
    spec = importlib.util.spec_from_file_location("round4_queue_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = set()
    for leg in mod.LEGS:
        assert leg["run"] in mod.RUNNERS
        assert leg["name"] not in names, f"duplicate leg {leg['name']}"
        names.add(leg["name"])
        if "path" in leg:
            assert os.path.exists(os.path.join(ROOT, leg["path"])), leg
