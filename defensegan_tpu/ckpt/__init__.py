"""Orbax checkpointing with the reference's cfg-in-output-dir convention.

Reference parity: models/base_model.py of kabkabm/defensegan (~L150-300):
tf.train.Saver checkpoints under output/gans/<dataset>/, `load()` restores the
latest, and `--cfg <output-dir>` re-loads the run's stored YAML. Here the
same UX sits on orbax (async-capable, pytree-native, multi-host-safe).
"""

from defensegan_tpu.ckpt.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]
