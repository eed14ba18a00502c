"""Amortized-inversion encoder: E(x) -> z on the generator manifold.

NOT in the reference (kabkabm/defensegan has no encoder anywhere) — this is
a TPU-first EXTENSION of the Defense-GAN family: the reference's projection
(models/gan.py::reconstruct, R random restarts x L GD steps) spends all its
time in an inherently SERIAL lax.scan, the one structure a TPU cannot
parallelize away. An encoder amortizes most of that serial work into a
single feedforward MXU pass: initialize the projection at E(x) instead of
z ~ N(0, I) and far fewer (R, L) suffice for the same reconstruction
quality (the standard amortized-inference move, cf. iGAN/BiGAN-style
inversion encoders). The projection still runs — the encoder only moves the
starting point — so the defense's semantics (momentum GD on ||G(z) - x||^2,
best-of-R selection) are unchanged; reference behavior is recovered exactly
with rec_init="random" (the default everywhere).

Architecture: mirror of the WGAN critic (models/critic.py) — strided 5x5
convs + LeakyReLU, no normalization — with a final Dense to z_dim instead
of a scalar score. Input is TANH-space images [-1, 1] (the generator's
output space, so E(G(z)) composes directly); the z0-policy helpers in
defense/encoder_init.py handle [0, 1] image-space conversion.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Encoder(nn.Module):
    """Strided-conv encoder: tanh-space image -> latent z.

    Attributes:
      channels: per-downsampling-block output channels, finest first
        (same convention as models/critic.py::Critic).
      z_dim: latent dimension of the matching generator.
      kernel: conv kernel size.
      dtype: compute dtype; params are float32.
    """

    channels: Sequence[int] = (64, 128)
    z_dim: int = 128
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
        z = nn.Dense(self.z_dim, dtype=self.dtype, name="fc_z")(h)
        return z.astype(jnp.float32)


def encoder_for(dataset: str, dim: int = 64, z_dim: int = 128,
                dtype: jnp.dtype = jnp.float32) -> Encoder:
    """Per-dataset encoder, topology-matched to critic_for."""
    name = dataset.lower().replace("-", "").replace("_", "")
    if name in ("mnist", "fmnist", "fashionmnist", "digits"):
        return Encoder(channels=(dim, 2 * dim), z_dim=z_dim, dtype=dtype)
    if name in ("celeba", "imagenet64"):
        return Encoder(channels=(dim, 2 * dim, 4 * dim, 8 * dim),
                       z_dim=z_dim, dtype=dtype)
    raise ValueError(f"unknown dataset {dataset!r}")
