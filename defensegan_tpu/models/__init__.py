"""Flax model zoo: WGAN generator / critic and classifiers A-F.

Reference parity: models/gan.py (generator_fn / discriminator_fn, ~L40-200) and
utils/network_builder.py (model_a .. model_f, ~L20-250) of kabkabm/defensegan.
"""

from defensegan_tpu.models.generator import Generator, generator_for
from defensegan_tpu.models.critic import Critic, critic_for
from defensegan_tpu.models.encoder import Encoder, encoder_for
from defensegan_tpu.models.classifiers import (
    ModelA,
    ModelB,
    ModelC,
    ModelD,
    ModelE,
    ModelF,
    CLASSIFIER_ZOO,
    build_classifier,
)

__all__ = [
    "Generator",
    "generator_for",
    "Critic",
    "critic_for",
    "Encoder",
    "encoder_for",
    "ModelA",
    "ModelB",
    "ModelC",
    "ModelD",
    "ModelE",
    "ModelF",
    "CLASSIFIER_ZOO",
    "build_classifier",
]
