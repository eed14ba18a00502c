"""Path/string helpers (reference: utils/misc.py of kabkabm/defensegan)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def ensure_dir(path: str) -> str:
    """mkdir -p and return the path (reference: utils/misc.py::ensure_dir)."""
    os.makedirs(path, exist_ok=True)
    return path


def append_jsonl(path: str, record: Dict[str, Any]) -> None:
    """Structured metrics logging (new; reference only prints to stdout)."""
    ensure_dir(os.path.dirname(path) or ".")
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
