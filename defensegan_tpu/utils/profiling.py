"""Tracing / profiling / numerics-debugging helpers.

The reference has NO tracing or profiling subsystem (SURVEY.md section 5 —
wall-clock prints only). TPU-native replacements:

  - `trace(logdir)`: jax.profiler context manager -> Perfetto/XProf trace of
    the jitted steps (view with xprof / tensorboard).
  - `phase_timer`: lightweight per-phase wall-clock aggregation (attack /
    purify / classify), with honest device barriers.
  - `nan_guard()`: enables jax_debug_nans for a scope (the TPU-native
    equivalent of sprinkling tf.check_numerics).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "output/traces") -> Iterator[None]:
    """Capture an XProf/Perfetto trace of everything inside the scope."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enable: bool = True) -> Iterator[None]:
    """Raise on NaN production inside the scope (jax_debug_nans)."""
    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class PhaseTimer:
    """Accumulate wall-clock per phase; `block=` pytree is barriered first."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        """Fold an externally-measured duration into the phase totals."""
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 4)}
                for k, v in self.totals.items()}

    def __str__(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s/{self.counts[k]}"
                          for k, v in self.totals.items())
