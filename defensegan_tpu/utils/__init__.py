"""Small utilities: image grids, path helpers, metrics logging.

Reference parity: utils/visualize.py and utils/misc.py of kabkabm/defensegan.
"""

from defensegan_tpu.utils.misc import ensure_dir
from defensegan_tpu.utils.visualize import merge, save_images

__all__ = ["ensure_dir", "merge", "save_images"]
