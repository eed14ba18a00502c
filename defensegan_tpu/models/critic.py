"""WGAN critic (discriminator), designed TPU-first.

Reference parity: models/gan.py::discriminator_fn of kabkabm/defensegan
(~L120-200): strided 5x5 convs + LeakyReLU, NO normalization (WGAN-GP forbids
BatchNorm in the critic — the gradient penalty is computed per-sample), final
dense to a scalar score.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Critic(nn.Module):
    """Strided-conv critic: image in [-1, 1] -> scalar Wasserstein score.

    Attributes:
      channels: per-downsampling-block output channels, finest first.
      kernel: conv kernel size.
      dtype: compute dtype; params are float32.
    """

    channels: Sequence[int] = (64, 128)
    kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for i, c in enumerate(self.channels):
            h = nn.Conv(c, (self.kernel, self.kernel), strides=(2, 2),
                        padding="SAME", dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = h.reshape(h.shape[0], -1)
        score = nn.Dense(1, dtype=self.dtype, name="fc_out")(h)
        return score.astype(jnp.float32)[:, 0]


def critic_for(dataset: str, dim: int = 64,
               dtype: jnp.dtype = jnp.float32) -> Critic:
    """Build the per-dataset critic (reference: models/gan.py subclasses)."""
    name = dataset.lower().replace("-", "").replace("_", "")
    if name in ("mnist", "fmnist", "fashionmnist", "digits"):
        return Critic(channels=(dim, 2 * dim), dtype=dtype)
    if name in ("celeba", "imagenet64"):
        return Critic(channels=(dim, 2 * dim, 4 * dim, 8 * dim), dtype=dtype)
    raise ValueError(f"unknown dataset {dataset!r}")
