"""WGAN-GP training + the user-facing DefenseGAN model.

Reference parity: models/gan.py (DefenseGANBase.train, ~L200-350) and
models/base_model.py (session/saver plumbing) of kabkabm/defensegan.
"""

from defensegan_tpu.gan.losses import critic_loss_fn, generator_loss_fn, gradient_penalty
from defensegan_tpu.gan.train import GANState, make_train_step, init_gan_state
from defensegan_tpu.gan.defense_gan import DefenseGAN

__all__ = [
    "critic_loss_fn",
    "generator_loss_fn",
    "gradient_penalty",
    "GANState",
    "make_train_step",
    "init_gan_state",
    "DefenseGAN",
]
