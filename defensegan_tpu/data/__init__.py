"""Data pipelines: MNIST / Fashion-MNIST / CelebA.

Reference parity: datasets/ of kabkabm/defensegan (dataset.py, mnist.py,
fmnist.py, celeba.py, utils.py). Images are returned as float32 numpy arrays
in [0, 1], NHWC; GAN training converts to the generator's [-1, 1] space
internally (the reference scales to [-1, 1] at load time instead).

This environment has no network access, so the download helpers of the
reference are replaced by: parse standard files if present under data_dir
(IDX for MNIST/F-MNIST, aligned JPEGs + list_attr_celeba.txt for CelebA),
else fall back to a deterministic synthetic dataset so every pipeline stays
runnable end-to-end.
"""

from defensegan_tpu.data.dataset import Dataset, get_dataset

__all__ = ["Dataset", "get_dataset"]
