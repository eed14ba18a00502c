#!/usr/bin/env python
"""Repo-root wrapper, CLI-compatible with the reference's train.py:
  python train.py --cfg defensegan_tpu/configs/gans/mnist.yml --is_train
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defensegan_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    main()
