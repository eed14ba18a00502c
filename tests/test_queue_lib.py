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
