"""defensegan_tpu — a TPU-native JAX rebuild of Defense-GAN (kabkabm/defensegan).

Defense-GAN (Samangouei, Kabkab & Chellappa, ICLR 2018, arXiv:1805.06605) defends
classifiers against adversarial examples by projecting each input onto the range of
a WGAN generator: z* = argmin_z ||G(z) - x||^2 via R random restarts x L gradient
descent steps, then classifying G(z*).

This package is a from-scratch TPU-first implementation:
  - models/    Flax generator / critic / classifier zoo A-F
               (reference: models/gan.py, utils/network_builder.py)
  - gan/       WGAN-GP training, jitted + data-parallel over a jax Mesh
               (reference: models/gan.py train())
  - defense/   the projection core as jit(vmap(scan)) (reference:
               models/gan.py DefenseGANBase.reconstruct ~L350-500)
  - kernels/   Pallas TPU kernels for the fused projection hot loop
  - attacks/   pure-JAX FGSM / RAND+FGSM / CW-L2 / black-box substitute
               (reference: whitebox.py, blackbox.py + cleverhans)
  - eval/      robust-accuracy harness (reference: utils/gan_defense.py)
  - data/      MNIST / F-MNIST / CelebA pipelines (reference: datasets/)
  - configs/   YAML + dataclass config system (reference: utils/config.py)
  - ckpt/      orbax checkpointing (reference: models/base_model.py save/load)
  - parallel/  device mesh + sharding helpers (new; reference has none)
"""

__version__ = "0.1.0"
