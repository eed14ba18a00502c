"""Shared CLI plumbing: --cfg resolution + config overrides + model loading.

Reference parity: the flag blocks at the top of train.py / whitebox.py /
blackbox.py of kabkabm/defensegan and utils/config.py's cfg resolution.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from defensegan_tpu.configs import Config, load_config
from defensegan_tpu.data import get_dataset
from defensegan_tpu.gan import DefenseGAN

DEFAULT_CFG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "gans", "mnist.yml")


def add_cfg_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--cfg", default=DEFAULT_CFG,
                    help="YAML config or a trained run's output dir")
    ap.add_argument("--rec_iters", type=int, default=None)
    ap.add_argument("--rec_rr", type=int, default=None)
    ap.add_argument("--rec_lr", type=float, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--train_iters", type=int, default=None)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--override", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="extra config overrides (any UPPERCASE YAML key)")


def cfg_from_args(args: argparse.Namespace) -> Config:
    overrides = {}
    for name in ("rec_iters", "rec_rr", "rec_lr", "batch_size",
                 "train_iters", "output_dir", "data_dir", "seed"):
        v = getattr(args, name, None)
        if v is not None:
            overrides[name] = v
    for kv in args.override:
        k, _, v = kv.partition("=")
        try:
            import yaml
            overrides[k.lower()] = yaml.safe_load(v)
        except Exception:
            overrides[k.lower()] = v
    return load_config(args.cfg, overrides)


def load_gan(cfg: Config, require_trained: bool = False) -> DefenseGAN:
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print(f"loaded GAN checkpoint (step {int(gan.state.step)}) "
              f"from {cfg.output_dir}")
    elif require_trained:
        raise SystemExit(
            f"no trained GAN under {cfg.output_dir}; run train.py first "
            f"(python train.py --cfg {cfg.output_dir or 'cfg.yml'} "
            f"--is_train)")
    return gan


def load_data(cfg: Config):
    ds = get_dataset(cfg.type, data_dir=cfg.data_dir, seed=cfg.seed)
    return ds


def limit(x: np.ndarray, y: np.ndarray, n: Optional[int]):
    if n is None or n <= 0 or n >= x.shape[0]:
        return x, y
    return x[:n], y[:n]
