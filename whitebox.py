#!/usr/bin/env python
"""Repo-root wrapper, CLI-compatible with the reference's whitebox.py:
  python whitebox.py --cfg <dir-or-yml> --attack_type fgsm
      --defense_type defense_gan --model A
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defensegan_tpu.cli.whitebox import main  # noqa: E402

if __name__ == "__main__":
    main()
