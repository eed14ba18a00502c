"""Pytree checkpoint save/restore on orbax.

Reference parity: models/base_model.py save()/load() of kabkabm/defensegan.
Checkpoints live under <output_dir>/checkpoints/<step>/ and `restore` with
step=None loads the latest, mirroring tf.train.latest_checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

_SUBDIR = "checkpoints"


def _ckpt_root(output_dir: str) -> str:
    return os.path.abspath(os.path.join(output_dir, _SUBDIR))


def latest_step(output_dir: str) -> Optional[int]:
    root = _ckpt_root(output_dir)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def save_checkpoint(output_dir: str, step: int, state: Any) -> str:
    """Save a pytree under <output_dir>/checkpoints/<step>/."""
    path = os.path.join(_ckpt_root(output_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(output_dir: str, abstract_state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore the pytree saved at `step` (default: latest).

    `abstract_state` is a matching pytree of arrays or ShapeDtypeStructs used
    to validate/structure the restore (pass the freshly-initialized state).
    """
    if step is None:
        step = latest_step(output_dir)
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {_ckpt_root(output_dir)}")
    path = os.path.join(_ckpt_root(output_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)
