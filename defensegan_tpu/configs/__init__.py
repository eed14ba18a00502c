"""Config system: YAML files with UPPERCASE keys + CLI overrides.

Reference parity: utils/config.py of kabkabm/defensegan — loads a YAML cfg
(UPPERCASE keys like TYPE / BATCH_SIZE / REC_ITERS) and registers each key as a
tf.app.flags flag so the CLI can override; `--cfg` may also point at a trained
run's output directory, which re-loads the cfg stored there.

Here the same UX is kept (UPPERCASE YAML keys, output-dir cfg resolution,
CLI overrides) on top of a typed dataclass instead of global TF flags.
"""

from defensegan_tpu.configs.config import Config, load_config, save_config

__all__ = ["Config", "load_config", "save_config"]
