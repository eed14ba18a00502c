"""Classifier zoo: models A-F from the Defense-GAN paper.

Reference parity: utils/network_builder.py::model_a..model_f of
kabkabm/defensegan (~L20-250), which implements the cleverhans-tutorial CNN/MLP
zoo (Defense-GAN paper arXiv:1805.06605, appendix Table 5; originally from
Papernot et al., "Practical Black-Box Attacks"). Layer lists below follow the
paper's table; they return LOGITS (attacks need logits, softmax applied by the
caller). Inputs are images in [0, 1], NHWC.

TPU-first notes: plain Flax modules compiled under jit; dropout is expressed
with an explicit rngs={'dropout': key} during training and is the identity at
eval (deterministic=True), so the eval path is a pure matmul/conv chain.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ModelA(nn.Module):
    """Conv(64,5,1)-Conv(64,5,2)-Drop(.25)-FC(128)-Drop(.5)-FC(10)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        h = nn.relu(nn.Conv(64, (5, 5), strides=(1, 1), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(64, (5, 5), strides=(2, 2), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.Dropout(0.25, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


class ModelB(nn.Module):
    """Drop(.2)-Conv(64,8,2)-Conv(128,6,2)-Conv(128,5,1)-Drop(.5)-FC(10)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        h = nn.relu(nn.Conv(64, (8, 8), strides=(2, 2), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(128, (6, 6), strides=(2, 2), padding="VALID",
                            dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(128, (5, 5), strides=(1, 1), padding="VALID",
                            dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


class ModelC(nn.Module):
    """Conv(128,3,1)-Conv(64,5,2)-Drop(.25)-FC(128)-Drop(.5)-FC(10)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        h = nn.relu(nn.Conv(128, (3, 3), strides=(1, 1), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(64, (5, 5), strides=(2, 2), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.Dropout(0.25, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


class ModelD(nn.Module):
    """[FC(300)-ReLU-Drop(.5)] x3 - FC(10) (MLP)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype).reshape(x.shape[0], -1)
        for _ in range(3):
            h = nn.relu(nn.Dense(300, dtype=self.dtype)(h))
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


class ModelE(nn.Module):
    """FC(200)-ReLU-FC(200)-ReLU-FC(10) (MLP, no dropout)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype).reshape(x.shape[0], -1)
        h = nn.relu(nn.Dense(200, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(200, dtype=self.dtype)(h))
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


class ModelF(nn.Module):
    """Conv(32,5,1)-MaxPool-Conv(64,5,1)-MaxPool-FC(1024)-FC(10) (LeNet-ish)."""

    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.astype(self.dtype)
        h = nn.relu(nn.Conv(32, (5, 5), strides=(1, 1), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(nn.Conv(64, (5, 5), strides=(1, 1), padding="SAME",
                            dtype=self.dtype)(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(h))
        return nn.Dense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)


CLASSIFIER_ZOO = {
    "A": ModelA,
    "B": ModelB,
    "C": ModelC,
    "D": ModelD,
    "E": ModelE,
    "F": ModelF,
}


def build_classifier(name: str, num_classes: int = 10,
                     dtype: jnp.dtype = jnp.float32) -> nn.Module:
    """Build classifier by letter, mirroring the reference's --model {A..F} flag."""
    key = name.strip().upper()
    if key not in CLASSIFIER_ZOO:
        raise ValueError(
            f"unknown classifier {name!r}; choose from {sorted(CLASSIFIER_ZOO)}")
    return CLASSIFIER_ZOO[key](num_classes=num_classes, dtype=dtype)
