#!/usr/bin/env python
"""Repo-root wrapper, CLI-compatible with the reference's blackbox.py:
  python blackbox.py --cfg <dir-or-yml> --bb_model A --sub_model B
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defensegan_tpu.cli.blackbox import main  # noqa: E402

if __name__ == "__main__":
    main()
