"""Dataset download helpers.

Reference parity: datasets/utils.py of kabkabm/defensegan (maybe_download-
style fetchers into ./data/<name>/; CelebA needs a manual/gdrive fetch).

This build environment has zero egress, so these helpers degrade gracefully:
they try urllib, and on failure print exactly which files to place where —
the loaders in dataset.py pick up standard files automatically and fall back
to synthetic data otherwise.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
from typing import Dict

from defensegan_tpu.utils.misc import ensure_dir

MNIST_FILES = ("train-images-idx3-ubyte.gz", "train-labels-idx1-ubyte.gz",
               "t10k-images-idx3-ubyte.gz", "t10k-labels-idx1-ubyte.gz")

MIRRORS: Dict[str, Dict] = {
    "mnist": {
        "urls": ["https://storage.googleapis.com/cvdf-datasets/mnist/",
                 "https://ossci-datasets.s3.amazonaws.com/mnist/"],
        "files": MNIST_FILES,
    },
    "f-mnist": {
        "urls": ["http://fashion-mnist.s3-website.eu-central-1"
                 ".amazonaws.com/"],
        "files": MNIST_FILES,
    },
    # CelebA has no stable direct mirror (the reference requires a manual
    # Google-Drive fetch too); list_attr_celeba.txt + img_align_celeba/ must
    # be placed under data/celeba/ by hand.
}


def maybe_download(dataset: str, data_dir: str = "data",
                   quiet: bool = False,
                   mirrors: Dict[str, Dict] = None) -> bool:
    """Fetch a dataset's standard files if absent. Returns True when all
    files are present afterwards (reference: datasets/utils.py).

    `mirrors` overrides the module MIRRORS table (tests point it at a
    loopback HTTP server so the full urllib path is exercised offline).
    """
    name = dataset.lower().replace("_", "-")
    spec = (MIRRORS if mirrors is None else mirrors).get(name)
    target = ensure_dir(os.path.join(data_dir, name))
    if spec is None:
        if not quiet:
            print(f"no auto-download for {dataset!r}; place its files under "
                  f"{target}/ (see defensegan_tpu/data/dataset.py for the "
                  "expected layout)")
        return False
    ok = True
    for fname in spec["files"]:
        dest = os.path.join(target, fname)
        if os.path.exists(dest):
            continue
        fetched = False
        for base in spec["urls"]:
            try:
                if not quiet:
                    print(f"downloading {base}{fname} ...")
                urllib.request.urlretrieve(base + fname, dest)
                fetched = True
                break
            except (urllib.error.URLError, OSError) as e:
                if not quiet:
                    print(f"  failed ({e}); trying next mirror")
                if os.path.exists(dest):
                    os.remove(dest)
        if not fetched:
            ok = False
    if not ok and not quiet:
        print(f"could not fetch all {dataset} files (offline?); the data "
              f"layer will use the synthetic fallback until the files above "
              f"are placed in {target}/")
    return ok
