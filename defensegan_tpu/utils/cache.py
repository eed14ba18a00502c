"""Persistent XLA compilation cache (new; no analogue in the reference).

Mosaic/XLA compiles of the fused projection kernel take minutes on a cold
process; the jax persistent cache amortizes them across processes. Call
`enable_compilation_cache()` early (bench.py and scripts/ do)."""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("DEFENSEGAN_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
