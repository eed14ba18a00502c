"""DCGAN-style WGAN generators, designed TPU-first.

Reference parity: models/gan.py::generator_fn of kabkabm/defensegan (~L40-120):
z in R^latent_dim -> FC -> conv-transpose blocks with BatchNorm+ReLU -> tanh image.

TPU-first design notes (NOT a translation of the TF1 graph):
  - all spatial dims are powers-of-two friendly: MNIST upsamples 7 -> 14 -> 28,
    CelebA 4 -> 8 -> 16 -> 32 -> 64, so XLA tiles conv-transposes onto the MXU
    without padding waste;
  - compute dtype is configurable (bfloat16 on TPU); params stay float32;
  - BatchNorm uses batch stats during GAN training and running averages during
    the projection defense, so at defense time the whole generator is a chain of
    matmul/conv + cheap elementwise ops that XLA fuses aggressively.

Output is tanh in [-1, 1]; use `to_image_space` to map into the [0, 1] image
space used by classifiers and attacks.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def to_image_space(g: jnp.ndarray) -> jnp.ndarray:
    """Map generator output from [-1, 1] (tanh) to [0, 1] image space."""
    return (g + 1.0) * 0.5


def from_image_space(x: jnp.ndarray) -> jnp.ndarray:
    """Map [0, 1] images to the generator's [-1, 1] space.

    uint8 inputs ([0, 255]) are accepted and normalized ON DEVICE: real
    serving inputs are uint8 images, and shipping them to the chip
    un-normalized is 4x less host->device (and DCN/PCIe) traffic — on
    the measured serving curve the float32 input upload, not compute,
    dominated end-to-end latency at the fast operating points
    (RESULTS.md round 5b). Every projection/encoder ingest path funnels
    through this function, so uint8 works everywhere uniformly.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x * 2.0 - 1.0


class Generator(nn.Module):
    """Conv-transpose generator: z -> image in [-1, 1].

    Attributes:
      base_hw: spatial size of the seed feature map (7 for 28x28, 4 for 64x64).
      channels: per-upsampling-block output channels, coarsest first. The last
        entry is followed by the final conv-transpose to `out_channels`.
      out_channels: image channels (1 for MNIST/F-MNIST, 3 for CelebA).
      kernel: conv-transpose kernel size.
      dtype: compute dtype (bfloat16 on TPU); params are float32.
    """

    base_hw: int = 7
    channels: Sequence[int] = (128, 64)
    out_channels: int = 1
    kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        z = z.astype(self.dtype)
        c0 = self.channels[0]
        h = nn.Dense(self.base_hw * self.base_hw * c0, dtype=self.dtype,
                     name="fc_in")(z)
        h = h.reshape(h.shape[0], self.base_hw, self.base_hw, c0)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_in")(h)
        h = nn.relu(h)
        for i, c in enumerate(self.channels[1:]):
            h = nn.ConvTranspose(c, (self.kernel, self.kernel), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=f"deconv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn_{i}")(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(self.out_channels, (self.kernel, self.kernel),
                             strides=(2, 2), padding="SAME", dtype=self.dtype,
                             name="deconv_out")(h)
        return jnp.tanh(h).astype(jnp.float32)

    @property
    def output_hw(self) -> int:
        # one stride-2 conv-transpose per entry in `channels[1:]` plus the
        # final one to `out_channels` => upsample factor 2**len(channels)
        return self.base_hw * (2 ** len(self.channels))


def generator_for(dataset: str, dim: int = 64, dtype: jnp.dtype = jnp.float32,
                  arch: str = "deep") -> Generator:
    """Build the per-dataset generator (reference: models/gan.py subclasses).

    arch="deep" (default, reference-like depth):
      MNIST / F-MNIST / digits: 7 -> 14 -> 28, 1 channel.
      CelebA / ImageNet-64:     4 -> 8 -> 16 -> 32 -> 64, 3 channels.
    arch="wide" (TPU-fast operating point — ~4x fewer projection FLOPs):
      MNIST family: fc -> 14x14x(2*dim) -> deconv -> 28, one hidden
      nonlinearity over a wide spatial map;
      CelebA family: 8 -> 16 -> 32 -> 64 (one level shallower).
    """
    name = dataset.lower().replace("-", "").replace("_", "")
    if name in ("mnist", "fmnist", "fashionmnist", "digits"):
        if arch == "wide":
            return Generator(base_hw=14, channels=(2 * dim,), out_channels=1,
                             dtype=dtype)
        return Generator(base_hw=7, channels=(2 * dim, dim), out_channels=1,
                         dtype=dtype)
    if name in ("celeba", "imagenet64"):
        if arch == "wide":
            return Generator(base_hw=8,
                             channels=(4 * dim, 2 * dim, dim),
                             out_channels=3, dtype=dtype)
        return Generator(base_hw=4, channels=(8 * dim, 4 * dim, 2 * dim, dim),
                         out_channels=3, dtype=dtype)
    raise ValueError(f"unknown dataset {dataset!r}")
